"""Core runtime: checkpointing, config."""
from unet_tpu.core import checkpoint, config, profiling  # noqa: F401
