"""ShuffleNetV2 x1.0 feature encoder (torchvision-compatible).

Backbone option of LightweightNestedUNet (reference
unetpp_lightweight.py:152-160 slices torchvision shufflenet_v2_x1_0 into
[conv1, maxpool, stage2, stage3, stage4]; its forward then max-pools stage4
once more, unetpp_lightweight.py:211-217). Stage widths (x1.0): 24 / 116 /
232 / 464. NB the reference's channel table claims 1024 for the last stage
(conv5) but its forward never runs conv5 — the actual tensor is 464-wide;
like the other encoder tables this made the torch model unbuildable, which
lazy Flax shapes absorb.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet_tpu.models.blocks import max_pool2

STAGE_REPEATS = (4, 8, 4)
STAGE_CHANNELS = (116, 232, 464)  # x1.0


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """(..., C) -> interleave `groups` channel groups (torchvision semantics:
    reshape (groups, C//groups) and transpose)."""
    c = x.shape[-1]
    x = x.reshape(x.shape[:-1] + (groups, c // groups))
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(x.shape[:-2] + (c,))


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class _Unit(nn.Module):
    """ShuffleNetV2 inverted residual unit."""
    out_channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        half = self.out_channels // 2

        def branch2(t, name):
            t = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv1")(t)
            t = nn.relu(bn(f"{name}_bn1")(t))
            t = nn.Conv(half, (3, 3), (self.stride, self.stride), padding=1,
                        feature_group_count=half, use_bias=False,
                        dtype=self.dtype, name=f"{name}_dwconv")(t)
            t = bn(f"{name}_bn2")(t)
            t = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{name}_conv2")(t)
            return nn.relu(bn(f"{name}_bn3")(t))

        if self.stride == 1:
            left, right = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([left, branch2(right, "branch2")], axis=-1)
        else:
            cin = x.shape[-1]
            l = nn.Conv(cin, (3, 3), (2, 2), padding=1, feature_group_count=cin,
                        use_bias=False, dtype=self.dtype, name="branch1_dwconv")(x)
            l = bn("branch1_bn1")(l)
            l = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                        name="branch1_conv")(l)
            l = nn.relu(bn("branch1_bn2")(l))
            out = jnp.concatenate([l, branch2(x, "branch2")], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Encoder(nn.Module):
    """5-stage features matching the reference wiring
    (unetpp_lightweight.py:211-217): conv1 (/2, 24ch) -> maxpool (/4) ->
    stage2 (/8, 116) -> stage3 (/16, 232) -> stage4 (/32, 464) ->
    extra 2x2 maxpool (/64, 464)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        y = nn.Conv(24, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="conv1_bn")(y)
        y = nn.relu(y)
        x0 = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [x0]
        y = x0
        for s, (reps, ch) in enumerate(zip(STAGE_REPEATS, STAGE_CHANNELS)):
            for i in range(reps):
                y = _Unit(ch, stride=2 if i == 0 else 1, dtype=self.dtype,
                          name=f"stage{s + 2}_{i}")(y, train)
            feats.append(y)
        feats.append(max_pool2(y))  # the reference's extra F.max_pool2d
        return tuple(feats)
