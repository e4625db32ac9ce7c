"""Inference fast path: phase-packed NestedUNet forward for the MXU.

The reference runs its forward as plain NCHW torch convs (reference
src/models/unetpp.py:93-135). The TPU problem with that topology is channel
width: the 512^2/256^2 layers produce only 32/64 channels while the MXU is
128 lanes wide, so a direct conv wastes 75/50 % of every systolic pass —
measured ~11-16 % MFU on the v5e for the full-res tail.

This module rewrites each low-channel 3x3 conv as a **phase-packed** conv:
all four stride-2 output phases (a, b) in {0,1}^2 are produced together as
channel groups, turning

    conv3x3(C_in -> C_out) @ (H, W)

into

    conv4x4/stride2(C_in -> 4*C_out) @ (H/2, W/2)  + depth-to-space

with kernel W4[p, q, :, (a*2+b)*C_out + c] = W[p-a, q-b, :, c] (zero outside
0 <= p-a, q-b <= 2). The packed conv runs with 4x the output-channel width
(128 lanes full at C_out=32) at 16/9 the FLOPs — a large net win for every
lane-starved layer. BatchNorm is pre-folded into the conv weights (inference
only), pooling of a packed block is a free max over its 4 phase groups, and
the final 1x1 head is applied per-phase while still packed so no extra
full-resolution pass is spent on it.

All weight preparation is jnp (traceable): the pipeline calls
`fast_apply(variables, x)` inside its jitted step and XLA folds the prep —
elementwise passes over ~8 M params — into noise next to the 100+ GFLOP
forward. Numerically equivalent to
`NestedUNet.apply(variables, x, train=False)` up to float reassociation
(tested); selected via `SegmentCfg.fast_forward=True`
(pipeline/stages.run_pipeline).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from unet_tpu.ops.image import upsample2x_align_corners

# layers whose C_out underfills the 128-lane MXU get phase-packed
PACK_MAX_COUT = 64

BLOCK_NAMES = ("conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0",
               "conv3_1", "conv2_2", "conv1_3", "conv0_4")


class FastLayer(NamedTuple):
    w: jnp.ndarray            # (3,3,Cin,Cout) or packed (4,4,Cin,4Cout)
    b: jnp.ndarray            # (Cout,) or (4Cout,)
    packed: bool


class FastParams(NamedTuple):
    """BN-folded (and where profitable phase-packed) inference weights."""
    blocks: Dict[str, Tuple[FastLayer, FastLayer]]
    final_w: jnp.ndarray      # (1,1,C0,num_classes)
    final_b: jnp.ndarray
    dtype: Any


def _fold_bn(w: jnp.ndarray, b: jnp.ndarray, bn_params, bn_stats,
             eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into the preceding conv:
    y = gamma * (conv(x) + b - mean) / sqrt(var + eps) + beta."""
    gamma = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + eps)
    return w * scale[None, None, None, :], (b - mean) * scale + beta


def _pack3x3(w: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(3,3,Cin,Cout) -> (4,4,Cin,4Cout) producing the 4 stride-2 phases as
    channel groups (phase-major: out channel = (a*2+b)*Cout + c)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    w4 = jnp.zeros((4, 4, cin, 4, cout), w.dtype)
    for a in range(2):
        for bb in range(2):
            # W4[p, q, :, phase] = W[p-a, q-b] where the original tap exists
            w4 = w4.at[a:a + 3, bb:bb + 3, :, a * 2 + bb, :].set(w)
    return w4.reshape(4, 4, cin, 4 * cout), jnp.tile(b, 4)


def unpack_phases(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H/2, W/2, 4C) phase-major -> (B, H, W, C) (depth-to-space)."""
    B, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(B, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, h2 * 2, w2 * 2, c)


def phase_max(y: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool of the UNPACKED tensor, computed for free on the
    packed layout: the pool window at (i, j) is exactly the 4 phases."""
    B, h2, w2, c4 = y.shape
    return jnp.max(y.reshape(B, h2, w2, 4, c4 // 4), axis=3)


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _conv(x, w, b, stride: int, padding: int):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + b.astype(x.dtype)


def _conv_cat_free(pair, w, b, stride: int, padding: int):
    """conv(cat(a, c), W) WITHOUT materializing the concat: W splits along
    its input channels and the two partial convs accumulate in f32 before a
    single round to the compute dtype. Decoder concats at full resolution
    materialize up to 4.8 GB/b96 of bf16 before the conv reads them back —
    the int8 twin of this trick (models/quantized._qconv, bit-exact there
    because int32 adds are associative) measured −6.4 % on the whole int8
    forward (docs/PERF.md §2c). Here the f32 partial-sum add matches the
    MXU's internal f32 accumulation, so the result stays within the
    float-reassociation envelope the fast-forward equivalence tests
    already allow."""
    a, c = pair
    ca = a.shape[-1]

    def part(t, ww):
        return jax.lax.conv_general_dilated(
            t, ww.astype(t.dtype), (stride, stride),
            [(padding, padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    y = part(a, w[:, :, :ca]) + part(c, w[:, :, ca:]) \
        + b.astype(jnp.float32)
    return y.astype(a.dtype)


def prepare_fast_params(variables: Dict[str, Any], dtype=jnp.bfloat16,
                        pack_max_cout: int = PACK_MAX_COUT) -> FastParams:
    """Fold BN, phase-pack the lane-starved layers. Custom-encoder NestedUNet
    layout (models/unetpp.py). Pure jnp — safe to trace inside a jit."""
    params = variables["params"]
    stats = variables["batch_stats"]
    blocks: Dict[str, Tuple[FastLayer, FastLayer]] = {}
    for name in BLOCK_NAMES:
        layers = []
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            w = jnp.asarray(params[name][conv]["kernel"], jnp.float32)
            b = (jnp.asarray(params[name][conv]["bias"], jnp.float32)
                 if "bias" in params[name][conv] else
                 jnp.zeros((w.shape[-1],), jnp.float32))
            w, b = _fold_bn(w, b, params[name][bn], stats[name][bn])
            packed = w.shape[-1] <= pack_max_cout
            if packed:
                w, b = _pack3x3(w, b)
            layers.append(FastLayer(w, b, packed))
        blocks[name] = (layers[0], layers[1])
    return FastParams(blocks=blocks,
                      final_w=jnp.asarray(params["final"]["kernel"]),
                      final_b=jnp.asarray(params["final"]["bias"]),
                      dtype=dtype)


def _block(fp: FastParams, name: str, x: jnp.ndarray,
           keep_packed: bool = False) -> jnp.ndarray:
    """conv-BN(folded)-ReLU x2. Returns packed (B,H/2,W/2,4C) when the second
    conv is packed and keep_packed, else unpacked (B,H,W,C)."""
    l1, l2 = fp.blocks[name]
    s1 = 2 if l1.packed else 1
    y = (_conv_cat_free(x, l1.w, l1.b, s1, 1) if isinstance(x, tuple)
         else _conv(x, l1.w, l1.b, s1, 1))
    y = jax.nn.relu(y)
    if l1.packed:
        y = unpack_phases(y)
    y = _conv(y, l2.w, l2.b, 2 if l2.packed else 1, 1)
    y = jax.nn.relu(y)
    if l2.packed and not keep_packed:
        y = unpack_phases(y)
    return y


def nested_unet_forward_fast(fp: FastParams, x: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode forward, drop-in for the Flax apply (plain-chain decoder,
    reference src/models/unetpp.py:93-135). Returns (B, H, W, num_classes)."""
    x = x.astype(fp.dtype)
    up = lambda t: upsample2x_align_corners(t, t.ndim - 3, t.ndim - 2)
    # decoder concats travel as (skip, up) pairs into the consuming conv,
    # which splits its input channels instead (_conv_cat_free) — no
    # full-resolution concat ever materializes
    cat = lambda a, b: (a, b)

    def is_packed(name):
        return fp.blocks[name][1].packed

    pool = lambda name, t: phase_max(t) if is_packed(name) else _maxpool2(t)
    full = lambda name, t: unpack_phases(t) if is_packed(name) else t

    x0_0p = _block(fp, "conv0_0", x, keep_packed=True)   # (B,H/2,W/2,4*32)
    x1_0p = _block(fp, "conv1_0", pool("conv0_0", x0_0p), keep_packed=True)
    x2_0 = _block(fp, "conv2_0", pool("conv1_0", x1_0p))
    x3_0 = _block(fp, "conv3_0", _maxpool2(x2_0))
    x4_0 = _block(fp, "conv4_0", _maxpool2(x3_0))

    x3_1 = _block(fp, "conv3_1", cat(x3_0, up(x4_0)))
    x2_2 = _block(fp, "conv2_2", cat(x2_0, up(x3_1)))
    x1_3 = _block(fp, "conv1_3", cat(full("conv1_0", x1_0p), up(x2_2)))
    # final block kept packed so the 1x1 head runs at H/2 with 4x channels
    y = _block(fp, "conv0_4", cat(full("conv0_0", x0_0p), up(x1_3)),
               keep_packed=True)

    l2 = fp.blocks["conv0_4"][1]
    if not l2.packed:  # tiny inputs / no packing configured: plain head
        return _conv(y, fp.final_w, fp.final_b, 1, 0)
    # per-phase 1x1 head on the packed layout: (B,H/2,W/2,4,C) x (C,K),
    # then depth-to-space on the (4K) phase-major channels
    B, h2, w2, c4 = y.shape
    c = c4 // 4
    k = fp.final_w.shape[-1]
    yk = jnp.einsum("bhwpc,ck->bhwpk", y.reshape(B, h2, w2, 4, c),
                    fp.final_w[0, 0].astype(y.dtype)) \
        + fp.final_b.astype(y.dtype)
    return unpack_phases(yk.reshape(B, h2, w2, 4 * k))


def fast_apply(variables: Dict[str, Any], x: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """One-call form used by the pipeline (weight prep traced + folded by
    XLA): logits = fast_apply(variables, frames)."""
    return nested_unet_forward_fast(prepare_fast_params(variables, dtype), x)
