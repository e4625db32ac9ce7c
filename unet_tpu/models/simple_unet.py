"""SimpleUNet — legacy-checkpoint-compatible plain U-Net (no BatchNorm).

Mirrors reference src/models/simple_unet.py:20-128 exactly: enc1-4 double
convs (64..512), 2x2/2 max pools, ConvTranspose2d(k=2, s=2) upsamples, [up,
skip] concat order, dec3-1, final 1x1 conv. The 7-class 256x256 checkpoint
family (`checkpoints/best_model.pth`) loads through models.convert.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unet_tpu.models.blocks import DoubleConv, max_pool2


class SimpleUNet(nn.Module):
    num_classes: int = 7
    num_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        e1 = DoubleConv(64, self.dtype, name="enc1")(x)
        e2 = DoubleConv(128, self.dtype, name="enc2")(max_pool2(e1))
        e3 = DoubleConv(256, self.dtype, name="enc3")(max_pool2(e2))
        e4 = DoubleConv(512, self.dtype, name="enc4")(max_pool2(e3))

        up = lambda feats, name: nn.ConvTranspose(
            feats, (2, 2), strides=(2, 2), dtype=self.dtype,
            transpose_kernel=True, name=name)
        # concat order is [upsampled, skip] (reference simple_unet.py:110-121)
        d3 = DoubleConv(256, self.dtype, name="dec3")(
            jnp.concatenate([up(256, "up3")(e4), e3], axis=-1))
        d2 = DoubleConv(128, self.dtype, name="dec2")(
            jnp.concatenate([up(128, "up2")(d3), e2], axis=-1))
        d1 = DoubleConv(64, self.dtype, name="dec1")(
            jnp.concatenate([up(64, "up1")(d2), e1], axis=-1))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="final")(d1)
