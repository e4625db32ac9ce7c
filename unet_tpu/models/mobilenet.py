"""MobileNetV3 Small/Large feature encoders (torchvision-compatible).

Backbones for LightweightNestedUNet (reference unetpp_lightweight.py:122-151
slices torchvision mobilenet_v3_{small,large}.features into 5 stages).
Block specs mirror torchvision's InvertedResidual configs so ImageNet
checkpoints convert 1:1 (models.convert.convert_mobilenet_encoder).

NHWC; BatchNorm uses torchvision MobileNetV3 settings (eps 1e-3,
momentum 0.01 torch == 0.99 flax).
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (kernel, expanded, out, use_se, activation, stride) per features[i], i>=1
SMALL_SPEC = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hs", 2),
    (5, 240, 40, True, "hs", 1),
    (5, 240, 40, True, "hs", 1),
    (5, 120, 48, True, "hs", 1),
    (5, 144, 48, True, "hs", 1),
    (5, 288, 96, True, "hs", 2),
    (5, 576, 96, True, "hs", 1),
    (5, 576, 96, True, "hs", 1),
]
SMALL_LAST = 576
# reference stage split for 'small': features[:2],[2:4],[4:7],[7:9],[9:]
SMALL_STAGES = (2, 4, 7, 9)

LARGE_SPEC = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hs", 2),
    (3, 200, 80, False, "hs", 1),
    (3, 184, 80, False, "hs", 1),
    (3, 184, 80, False, "hs", 1),
    (3, 480, 112, True, "hs", 1),
    (3, 672, 112, True, "hs", 1),
    (5, 672, 160, True, "hs", 2),
    (5, 960, 160, True, "hs", 1),
    (5, 960, 160, True, "hs", 1),
]
LARGE_LAST = 960
LARGE_STAGES = (2, 4, 7, 9)


def _act(name: str, x):
    return jax.nn.hard_swish(x) if name == "hs" else nn.relu(x)


class _CNA(nn.Module):
    """Conv2dNormActivation: conv (no bias) + BN(eps 1e-3) + activation."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    activation: str = "hs"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding=(self.kernel - 1) // 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return _act(self.activation, x)


class _SE(nn.Module):
    """Squeeze-excitation (torchvision: fc1/relu/fc2/hardsigmoid)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = _make_divisible(self.channels // 4)
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class _InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    activation: str
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = x
        if self.expanded != inp:
            y = _CNA(self.expanded, 1, 1, activation=self.activation,
                     dtype=self.dtype, name="expand")(y, train)
        y = _CNA(self.expanded, self.kernel, self.stride, groups=self.expanded,
                 activation=self.activation, dtype=self.dtype, name="depthwise")(y, train)
        if self.use_se:
            y = _SE(self.expanded, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and inp == self.out:
            y = y + x
        return y


class MobileNetV3Encoder(nn.Module):
    """5-stage feature pyramid matching the reference's torchvision slicing
    (unetpp_lightweight.py:122-151): small -> (16, 24, 40, 48, 576),
    large -> (16, 24, 40, 80, 960) at strides (4, 8, 16, 16/32, 32)."""
    variant: str = "small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        spec, last, cuts = ((SMALL_SPEC, SMALL_LAST, SMALL_STAGES)
                            if self.variant == "small"
                            else (LARGE_SPEC, LARGE_LAST, LARGE_STAGES))
        feats: List[jnp.ndarray] = []
        # features[0]: stem conv 16ch s2 hardswish
        y = _CNA(16, 3, 2, activation="hs", dtype=self.dtype, name="features_0")(x, train)
        if 1 in cuts:
            feats.append(y)
        for i, cfg in enumerate(spec):
            idx = i + 1
            y = _InvertedResidual(*cfg, dtype=self.dtype,
                                  name=f"features_{idx}")(y, train)
            if idx + 1 in cuts:  # stage boundary after features[idx]
                feats.append(y)
        # last conv layer (features[12] small / features[16] large)
        y = _CNA(last, 1, 1, activation="hs", dtype=self.dtype,
                 name=f"features_{len(spec) + 1}")(y, train)
        feats.append(y)
        return tuple(feats)
