"""Shared Flax building blocks for the UNet family.

Layout is NHWC (TPU-native; channels-last feeds the MXU without transposes).
`dtype` controls compute precision (bfloat16 for speed); params stay float32.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """conv3x3 -> BN -> ReLU, twice — the reference's basic block
    (reference src/models/unetpp.py:13-26). BatchNorm uses torch defaults
    (eps 1e-5, running-stat momentum 0.1 == flax momentum 0.9)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """conv3x3 -> ReLU, twice, no BN — SimpleUNet's block
    (reference src/models/simple_unet.py:31-38)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        return nn.relu(x)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool (torch nn.MaxPool2d(2, 2)); NHWC."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
