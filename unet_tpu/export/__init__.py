"""AOT export (StableHLO via jax.export) + runner."""
from unet_tpu.export.aot import AotRunner, export_model, export_pipeline  # noqa: F401
