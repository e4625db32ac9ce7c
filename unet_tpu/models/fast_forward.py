"""Inference fast path: NestedUNet forward through fused Pallas ConvBlocks.

Drop-in replacement for `NestedUNet.apply(variables, x, train=False)` built
directly from the converted variables: every conv-BN-ReLU pair runs through
ops.pallas.conv_fused (BN pre-folded), pool/upsample/concat stay XLA.
Numerically equivalent to the Flax forward (tested); selected by the pipeline
when `use_pallas=True` on TPU.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from unet_tpu.models.blocks import max_pool2
from unet_tpu.ops.image import upsample2x_align_corners
from unet_tpu.ops.pallas.conv_fused import conv_block_fused


def nested_unet_forward_fused(variables: Dict[str, Any], x: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """Eval-mode NestedUNet forward (custom encoder; plain-chain decoder,
    reference src/models/unetpp.py:93-135) with fused conv blocks."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def block(name, t):
        return conv_block_fused(t, params[name], stats[name], interpret=interpret)

    up = lambda t: upsample2x_align_corners(t, t.ndim - 3, t.ndim - 2)
    cat = lambda a, b: jnp.concatenate([a, b], axis=-1)

    x0_0 = block("conv0_0", x)
    x1_0 = block("conv1_0", max_pool2(x0_0))
    x2_0 = block("conv2_0", max_pool2(x1_0))
    x3_0 = block("conv3_0", max_pool2(x2_0))
    x4_0 = block("conv4_0", max_pool2(x3_0))
    x3_1 = block("conv3_1", cat(x3_0, up(x4_0)))
    x2_2 = block("conv2_2", cat(x2_0, up(x3_1)))
    x1_3 = block("conv1_3", cat(x1_0, up(x2_2)))
    x0_4 = block("conv0_4", cat(x0_0, up(x1_3)))

    f = params["final"]
    return jnp.einsum("bhwc,co->bhwo", x0_4, f["kernel"][0, 0]) + f["bias"]
