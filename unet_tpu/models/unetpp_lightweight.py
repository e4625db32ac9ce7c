"""Lightweight UNet++ with pluggable encoders.

Mirrors reference src/models/unetpp_lightweight.py:33-284: per-encoder channel
tables, auto-selected decoder widths, [skip, up] concat, deep-supervision
heads gated on training — with the torch backbones re-expressed as Flax
modules (models.resnet / models.mobilenet).

Supported encoders: custom, resnet18, resnet34, mobilenet_v3_small,
mobilenet_v3_large, shufflenet_v2_x1_0.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from unet_tpu.models.blocks import ConvBlock, max_pool2
from unet_tpu.models.resnet import ResNetBasicEncoder
from unet_tpu.ops.image import upsample2x_align_corners, resize_bilinear_align_corners

ENCODER_CHANNELS = {
    "mobilenet_v3_small": (16, 24, 40, 48, 576),
    "mobilenet_v3_large": (16, 24, 40, 112, 960),
    "shufflenet_v2_x1_0": (24, 116, 232, 464, 1024),
    "resnet18": (64, 64, 128, 256, 512),
    "resnet34": (64, 64, 128, 256, 512),
    "custom": (32, 64, 128, 256, 512),
}

DEFAULT_DECODER_CHANNELS = {
    "mobilenet_v3_small": (16, 24, 40, 80),
    "mobilenet_v3_large": (24, 40, 80, 160),
    "shufflenet_v2_x1_0": (32, 64, 128, 256),
}


def default_decoder_channels(encoder: str) -> Sequence[int]:
    """Auto decoder widths (reference unetpp_lightweight.py:96-106)."""
    return DEFAULT_DECODER_CHANNELS.get(encoder, (64, 128, 256, 512))


class _CustomEncoder(nn.Module):
    """Five ConvBlocks with pooling between stages
    (reference unetpp_lightweight.py:180-188 + forward :219-224)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = ENCODER_CHANNELS["custom"]
        # The reference's forward chains encoder[i] directly with NO pooling
        # for the custom/resnet path (unetpp_lightweight.py:219-224); for the
        # custom ConvBlock stack that would keep everything full-res, so the
        # checkpoints that exist use the named encoders. We pool between
        # stages to make 'custom' usable; stage resolutions then match the
        # NestedUNet encoder.
        x0 = ConvBlock(ch[0], self.dtype, name="enc0")(x, train)
        x1 = ConvBlock(ch[1], self.dtype, name="enc1")(max_pool2(x0), train)
        x2 = ConvBlock(ch[2], self.dtype, name="enc2")(max_pool2(x1), train)
        x3 = ConvBlock(ch[3], self.dtype, name="enc3")(max_pool2(x2), train)
        x4 = ConvBlock(ch[4], self.dtype, name="enc4")(max_pool2(x3), train)
        return x0, x1, x2, x3, x4


class LightweightNestedUNet(nn.Module):
    num_classes: int
    encoder: str = "mobilenet_v3_small"
    deep_supervision: bool = False
    decoder_channels: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        if self.encoder not in ENCODER_CHANNELS:
            raise ValueError(f"unsupported encoder {self.encoder!r}")
        dec = tuple(self.decoder_channels or default_decoder_channels(self.encoder))

        if self.encoder == "custom":
            feats = _CustomEncoder(self.dtype, name="encoder")(x, train)
        elif self.encoder in ("resnet18", "resnet34"):
            layers = (2, 2, 2, 2) if self.encoder == "resnet18" else (3, 4, 6, 3)
            feats = ResNetBasicEncoder(layers, self.dtype, name="encoder")(x, train)
        elif self.encoder.startswith("mobilenet_v3"):
            from unet_tpu.models.mobilenet import MobileNetV3Encoder
            feats = MobileNetV3Encoder(variant=self.encoder.replace("mobilenet_v3_", ""),
                                       dtype=self.dtype, name="encoder")(x, train)
        elif self.encoder == "shufflenet_v2_x1_0":
            from unet_tpu.models.shufflenet import ShuffleNetV2Encoder
            feats = ShuffleNetV2Encoder(dtype=self.dtype, name="encoder")(x, train)
        else:
            raise NotImplementedError(f"{self.encoder} encoder pending")
        x0_0, x1_0, x2_0, x3_0, x4_0 = feats

        def up_to(t, skip):
            # Upsample to the skip's spatial size. For the usual stride
            # pattern this is exactly the reference's x2 align-corners
            # upsample; for encoders with equal-resolution adjacent stages
            # (mobilenet_v3: stages 3/4 both stride 16) the reference's blind
            # x2 made the concat spatially inconsistent (the torch model
            # cannot run) — matching the skip's size repairs that.
            hw = skip.shape[-3:-1]
            if t.shape[-3:-1] == hw:
                return t
            if (hw[0] == 2 * t.shape[-3]) and (hw[1] == 2 * t.shape[-2]):
                return upsample2x_align_corners(t, t.ndim - 3, t.ndim - 2)
            return resize_bilinear_align_corners(t, hw, t.ndim - 3, t.ndim - 2)

        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        x3_1 = ConvBlock(dec[3], self.dtype, name="conv3_1")(cat(x3_0, up_to(x4_0, x3_0)), train)
        x2_2 = ConvBlock(dec[2], self.dtype, name="conv2_2")(cat(x2_0, up_to(x3_1, x2_0)), train)
        x1_3 = ConvBlock(dec[1], self.dtype, name="conv1_3")(cat(x1_0, up_to(x2_2, x1_0)), train)
        x0_4 = ConvBlock(dec[0], self.dtype, name="conv0_4")(cat(x0_0, up_to(x1_3, x0_0)), train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="final")(x0_4)

        if self.deep_supervision and train:
            hw = x.shape[-3:-1]
            h_ax, w_ax = x.ndim - 3, x.ndim - 2
            up_to = lambda t: resize_bilinear_align_corners(t, hw, h_ax, w_ax)
            out3 = up_to(nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="ds3_1")(x3_1))
            out2 = up_to(nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="ds2_2")(x2_2))
            out1 = up_to(nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="ds1_3")(x1_3))
            return [out, out1, out2, out3]
        return out


def create_lightweight_unet(num_classes: int = 7, encoder: str = "mobilenet_v3_small",
                            deep_supervision: bool = False, dtype: Any = jnp.float32
                            ) -> LightweightNestedUNet:
    """Factory mirroring reference create_lightweight_unet
    (unetpp_lightweight.py:256-284); param counting lives in utils."""
    return LightweightNestedUNet(num_classes=num_classes, encoder=encoder,
                                 deep_supervision=deep_supervision, dtype=dtype)
