"""Core runtime: checkpointing, config."""
from unet_tpu.core import checkpoint, config  # noqa: F401
