"""Flax model zoo mirroring the reference's three architectures
(reference src/models/: unetpp.py, unetpp_lightweight.py, simple_unet.py)
plus functional loss ports and a torch-checkpoint converter."""

from unet_tpu.models.unetpp import NestedUNet  # noqa: F401
from unet_tpu.models.simple_unet import SimpleUNet  # noqa: F401
from unet_tpu.models.unetpp_lightweight import (  # noqa: F401
    LightweightNestedUNet, create_lightweight_unet, ENCODER_CHANNELS)
from unet_tpu.models import losses, convert  # noqa: F401
