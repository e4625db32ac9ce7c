"""AOT export (StableHLO via jax.export) + runner."""
from unet_tpu.export.aot import export_model, AotRunner  # noqa: F401
