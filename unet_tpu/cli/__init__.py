"""Command-line interface (python -m unet_tpu.cli)."""
from unet_tpu.cli.main import main  # noqa: F401
