"""Core runtime: checkpointing, config."""
from unet_tpu.core import checkpoint  # noqa: F401
