"""ResNet encoders (torchvision-compatible topology) for the UNet variants.

The reference optionally swaps its encoder for torchvision resnet50/18/34
feature stages (reference src/models/unetpp.py:56-66,
src/models/unetpp_lightweight.py:164-177). These Flax equivalents reproduce
the stage boundaries exactly so ImageNet/torch checkpoints convert 1:1
(models.convert maps torchvision state-dict keys onto these module names).

NHWC; `dtype` controls compute precision.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _bn(dtype, name):
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """resnet18/34 block: 3x3 -> 3x3 with identity/projection shortcut."""
    features: int
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        r = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)
        if self.project:
            r = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            r = bn("downsample_bn")(r)
        return nn.relu(y + r)


class Bottleneck(nn.Module):
    """resnet50 block: 1x1 -> 3x3(stride) -> 1x1(x4) with shortcut."""
    width: int
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, dtype=self.dtype, name=name)
        r = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.width, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.project:
            r = nn.Conv(self.width * 4, (1, 1), (self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            r = bn("downsample_bn")(r)
        return nn.relu(y + r)


class _Stem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (torchvision resnet stem)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _stage(block_cls, n_blocks, features, stride, dtype, name_prefix, x, train,
           first_project=True):
    # torchvision adds a projection shortcut only when stride != 1 or the
    # channel count changes (so resnet18/34 layer1 has none).
    for i in range(n_blocks):
        x = block_cls(features, stride if i == 0 else 1,
                      project=(i == 0 and first_project),
                      dtype=dtype, name=f"{name_prefix}_{i}")(x, train)
    return x


class ResNet50Encoder(nn.Module):
    """Feature stages matching the reference's pretrained-encoder wiring
    (src/models/unetpp.py:56-66): returns the 5 stage outputs with channels
    (64, 256, 512, 1024, 2048) at strides (4, 4, 8, 16, 32).

    Note stage0 *includes* the maxpool (the reference folds it into conv0_0),
    so stage0 and stage1 share spatial size — the decoder's first upsample
    therefore yields half-resolution logits, a reference quirk kept for
    weight parity.
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x0 = _Stem(self.dtype, name="stem")(x, train)
        x1 = _stage(Bottleneck, 3, 64, 1, self.dtype, "layer1", x0, train)
        x2 = _stage(Bottleneck, 4, 128, 2, self.dtype, "layer2", x1, train)
        x3 = _stage(Bottleneck, 6, 256, 2, self.dtype, "layer3", x2, train)
        x4 = _stage(Bottleneck, 3, 512, 2, self.dtype, "layer4", x3, train)
        return x0, x1, x2, x3, x4


class ResNetBasicEncoder(nn.Module):
    """resnet18/34 stages for LightweightNestedUNet
    (reference unetpp_lightweight.py:164-177): channels (64, 64, 128, 256, 512)."""
    layers: Sequence[int] = (2, 2, 2, 2)  # resnet18; (3, 4, 6, 3) for resnet34
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x0 = _Stem(self.dtype, name="stem")(x, train)
        l1, l2, l3, l4 = self.layers
        x1 = _stage(BasicBlock, l1, 64, 1, self.dtype, "layer1", x0, train,
                    first_project=False)
        x2 = _stage(BasicBlock, l2, 128, 2, self.dtype, "layer2", x1, train)
        x3 = _stage(BasicBlock, l3, 256, 2, self.dtype, "layer3", x2, train)
        x4 = _stage(BasicBlock, l4, 512, 2, self.dtype, "layer4", x3, train)
        return x0, x1, x2, x3, x4
