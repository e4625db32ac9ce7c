"""Pallas TPU kernels: fused 3x3 conv + folded-BN + ReLU.

The UNet forward is the single largest time slice of the two-stage pipeline
(SURVEY §3.4 is the kernel-fusion target). Each grid step computes one output
row-tile as nine shifted (TH*W, Cin) @ (Cin, Cout) MXU matmuls accumulated in
VMEM, then applies the BatchNorm affine (pre-folded to scale/bias) and ReLU
in-register — one HBM round-trip per activation instead of conv -> BN -> ReLU
each touching HBM.

Halo handling: this Pallas version has no unblocked/overlapping BlockSpecs,
so the padded input is pre-tiled in XLA into (B, n_tiles, TH+2, W+2, Cin)
with duplicated halo rows (a single fused HBM copy, ~(TH+2)/TH overhead).

`fused_conv_bn_relu(..., interpret=True)` runs on CPU for correctness tests;
`fold_bn` produces scale/bias from torch/flax BN parameters.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(gamma, beta, mean, var, conv_bias=None, eps: float = 1e-5
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BN(Wx + b) = scale * (Wx) + bias with
    scale = gamma / sqrt(var + eps), bias = beta + scale * (b - mean)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    b = conv_bias if conv_bias is not None else 0.0
    return scale, beta + scale * (b - mean)


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, th: int, w_out: int,
            cin: int, cout: int, out_dtype):
    acc = jnp.zeros((th * w_out, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = x_ref[0, 0, dy:dy + th, dx:dx + w_out, :]
            acc += jnp.dot(patch.reshape(th * w_out, cin).astype(jnp.float32),
                           w_ref[dy, dx].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    out = jnp.maximum(acc * s_ref[0].astype(jnp.float32)
                      + b_ref[0].astype(jnp.float32), 0.0)
    o_ref[0] = out.reshape(th, w_out, cout).astype(out_dtype)


def fused_conv_bn_relu(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                       bias: jnp.ndarray, row_tile: Optional[int] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """NHWC 3x3 SAME conv fused with affine + ReLU.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout); scale/bias: (Cout,).
    `row_tile` output rows per grid step (auto-sized to ~2MB input blocks).
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    if row_tile is None:
        # Mosaic keeps the 9 shifted-patch relayouts live concurrently, each
        # lane-padded to 128 — size tiles by output pixels scaled down for
        # wide channels. ~4096 px/tile at <=128ch f32 measured safe on v5e.
        padded_c = max(-(-Cin // 128) * 128, 128)
        pixels = max(4096 * 128 // padded_c, 256)
        row_tile = max(min(H, pixels // W), 1)
        while H % row_tile:
            row_tile -= 1
    th = row_tile
    assert H % th == 0, (H, th)
    n_tiles = H // th

    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    # pre-tile with duplicated halo rows -> non-overlapping block indexing
    tiles = jnp.stack([xp[:, i * th:i * th + th + 2] for i in range(n_tiles)],
                      axis=1)  # (B, n_tiles, th+2, W+2, Cin)

    kern = functools.partial(_kernel, th=th, w_out=W, cin=Cin, cout=Cout,
                             out_dtype=x.dtype)
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, W + 2, Cin),
                         lambda b, i: (b, i, 0, 0, 0)),
            pl.BlockSpec((3, 3, Cin, Cout), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tiles, kernel, scale.reshape(1, -1), bias.reshape(1, -1))


def conv_block_fused(x: jnp.ndarray, block_params: dict, block_stats: dict,
                     eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """Run a models.blocks.ConvBlock (conv-BN-ReLU x2) through the fused
    kernel using its Flax variables (inference fast path)."""
    out = x
    for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        p = block_params[conv]
        s = block_params[bn]
        st = block_stats[bn]
        scale, bias = fold_bn(s["scale"], s["bias"], st["mean"], st["var"],
                              conv_bias=p.get("bias"), eps=eps)
        out = fused_conv_bn_relu(out, p["kernel"], scale, bias,
                                 interpret=interpret)
    return out
