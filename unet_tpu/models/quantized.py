"""int8 inference path: statically-calibrated, phase-packed quantized forward.

The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate, and int8 activations
halve the HBM traffic of the full-resolution UNet tail — both wins compound
with the phase packing of models/fast_forward.py (reference forward:
src/models/unetpp.py:93-135; no quantized path exists in the reference — its
closest analogue is the TensorRT FP16 engine build, tools/build_engine.py).

Scheme (standard post-training quantization, TPU-shaped):
  * weights: BN-folded, per-OUTPUT-channel symmetric int8; the input
    tensor's scale is folded into the weights per INPUT channel first, so
    decoder concats of tensors with different scales stay exact and the
    int32 accumulator needs only the per-output-channel dequant factor.
  * activations: per-tensor symmetric int8 with STATIC scales collected by
    `calibrate()` (amax over calibration batches at every post-ReLU point).
    Static scales keep the quantize step a pure elementwise epilogue that
    XLA fuses into the producing conv — a dynamic amax would add a full
    reduction kernel per layer.
  * between layers tensors are stored as int8 (the bandwidth win);
    upsampling lerps in bf16 and requantizes onto the SAME scale (lerp is
    convex, the range cannot grow); 2x2 max-pool runs directly on int8.
  * the 1x1 head and everything after it stay bf16.

Scales travel as a hashable tuple so they can live inside the frozen
pipeline config (`SegmentCfg.int8_scales`); use
`pipeline.stages.calibrate_int8` to produce a ready config.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from unet_tpu.models.fast_forward import (BLOCK_NAMES, PACK_MAX_COUT,
                                          _fold_bn, _maxpool2, _pack3x3,
                                          phase_max, prepare_fast_params,
                                          unpack_phases)
from unet_tpu.ops.image import upsample2x_align_corners

# quantize points: the model input + every post-ReLU tensor
TAP_NAMES = ("input",) + tuple(f"{n}.relu{i}" for n in BLOCK_NAMES
                               for i in (1, 2))


class QLayer(NamedTuple):
    wq: jnp.ndarray        # int8 (3,3,Cin,Cout) or packed (4,4,Cin,4Cout)
    s_w: jnp.ndarray       # f32 per out channel (input scale pre-folded)
    b: jnp.ndarray         # f32
    packed: bool


class QParams(NamedTuple):
    blocks: Dict[str, Tuple[QLayer, QLayer]]
    final_w: jnp.ndarray
    final_b: jnp.ndarray
    scales: Dict[str, float]   # tap name -> activation scale (amax/127)
    dtype: Any                 # dequantized compute dtype (bf16)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

def observe_amax(variables: Dict[str, Any], x: jnp.ndarray,
                 dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """One fast-forward pass recording |amax| at every quantize point."""
    from unet_tpu.models import fast_forward as ff

    fp = prepare_fast_params(variables, dtype)
    rec: Dict[str, jnp.ndarray] = {}

    def tap(name, t):
        rec[name] = jnp.max(jnp.abs(t.astype(jnp.float32)))
        return t

    xd = x.astype(dtype)
    tap("input", xd)

    def block(name, t, keep_packed=False):
        l1, l2 = fp.blocks[name]
        y = jax.nn.relu(ff._conv(t, l1.w, l1.b, 2 if l1.packed else 1, 1))
        tap(f"{name}.relu1", y)
        if l1.packed:
            y = unpack_phases(y)
        y = jax.nn.relu(ff._conv(y, l2.w, l2.b, 2 if l2.packed else 1, 1))
        tap(f"{name}.relu2", y)
        if l2.packed and not keep_packed:
            y = unpack_phases(y)
        return y

    _run_topology(fp, xd, block)
    return rec


def calibrate(variables: Dict[str, Any], batches,
              dtype=jnp.float32) -> Tuple[Tuple[str, float], ...]:
    """amax over calibration batches -> hashable (name, scale) tuple with
    scale = amax / 127."""
    import numpy as np
    fn = jax.jit(lambda v, x: observe_amax(v, x, dtype))
    amax: Dict[str, float] = {}
    for x in batches:
        rec = fn(variables, jnp.asarray(x))
        for k, v in rec.items():
            amax[k] = max(amax.get(k, 0.0), float(np.asarray(v)))
    return tuple(sorted((k, max(v, 1e-8) / 127.0) for k, v in amax.items()))


# ---------------------------------------------------------------------------
# weight preparation
# ---------------------------------------------------------------------------

def _quantize_weights(w: jnp.ndarray, s_in: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(3,3,Cin,Cout) f32 + per-input-channel scale -> (int8, per-out s_w).
    s_in is folded in, so int32 acc * s_w[c] + b dequantizes exactly."""
    w = w * s_in[None, None, :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return wq, s_w


def prepare_int8_params(variables: Dict[str, Any],
                        scales: Tuple[Tuple[str, float], ...],
                        dtype=jnp.bfloat16,
                        pack_max_cout: int = PACK_MAX_COUT) -> QParams:
    sc = dict(scales)
    params = variables["params"]
    stats = variables["batch_stats"]

    def in_scale(name: str) -> jnp.ndarray:
        """Per-input-channel scale vector feeding block `name`'s conv1
        (concats in the decoder mix two source scales)."""
        enc_prev = {"conv1_0": "conv0_0", "conv2_0": "conv1_0",
                    "conv3_0": "conv2_0", "conv4_0": "conv3_0"}
        dec = {"conv3_1": ("conv3_0", "conv4_0"),
               "conv2_2": ("conv2_0", "conv3_1"),
               "conv1_3": ("conv1_0", "conv2_2"),
               "conv0_4": ("conv0_0", "conv1_3")}
        if name == "conv0_0":
            return jnp.full((3,), sc["input"], jnp.float32)
        if name in enc_prev:
            src = enc_prev[name]
            c = params[src]["conv2"]["kernel"].shape[-1]
            return jnp.full((c,), sc[f"{src}.relu2"], jnp.float32)
        skip, up = dec[name]
        c_skip = params[skip]["conv2"]["kernel"].shape[-1]
        c_up = params[up]["conv2"]["kernel"].shape[-1]
        return jnp.concatenate([
            jnp.full((c_skip,), sc[f"{skip}.relu2"], jnp.float32),
            jnp.full((c_up,), sc[f"{up}.relu2"], jnp.float32)])

    blocks: Dict[str, Tuple[QLayer, QLayer]] = {}
    for name in BLOCK_NAMES:
        layers = []
        for i, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
            w = jnp.asarray(params[name][conv]["kernel"], jnp.float32)
            b = (jnp.asarray(params[name][conv]["bias"], jnp.float32)
                 if "bias" in params[name][conv] else
                 jnp.zeros((w.shape[-1],), jnp.float32))
            w, b = _fold_bn(w, b, params[name][bn], stats[name][bn])
            s_in = (in_scale(name) if i == 0 else
                    jnp.full((w.shape[-2],), sc[f"{name}.relu1"], jnp.float32))
            wq, s_w = _quantize_weights(w, s_in)
            packed = w.shape[-1] <= pack_max_cout
            if packed:
                wq, _zeros = _pack3x3(wq, jnp.zeros_like(b))
                s_w = jnp.tile(s_w, 4)
                b = jnp.tile(b, 4)
            layers.append(QLayer(wq, s_w, b, packed))
        blocks[name] = (layers[0], layers[1])
    return QParams(blocks=blocks,
                   final_w=jnp.asarray(params["final"]["kernel"]),
                   final_b=jnp.asarray(params["final"]["bias"]),
                   scales=sc, dtype=dtype)


# ---------------------------------------------------------------------------
# int8 forward
# ---------------------------------------------------------------------------

def _qconv(xq, l: QLayer) -> jnp.ndarray:
    """int8 conv -> int32 accumulator.

    `xq` may be a PAIR (skip, upsampled) from a decoder concat point: the
    concat is then never materialized — the conv splits along its input
    channels, conv(cat(a,b), W) == conv(a, W[..a]) + conv(b, W[a..]), and
    the int32 accumulator sum is associative so the result is BIT-IDENTICAL
    to the concat form (tests/test_quantized.py::test_pair_conv_bit_exact).
    Skipping the concat removes up to 2.4 GB/b96 of HBM write+read per
    decoder level (the r5 per-op profile measured the forward's glue at
    0.71 ms/frame, 35 % of the int8 forward; docs/PERF.md §2c)."""
    def conv(t, w):
        return jax.lax.conv_general_dilated(
            t, w, ((2, 2) if l.packed else (1, 1)), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    if isinstance(xq, tuple):
        a, b = xq
        ca = a.shape[-1]
        return conv(a, l.wq[:, :, :ca]) + conv(b, l.wq[:, :, ca:])
    return conv(xq, l.wq)


def _requant(acc: jnp.ndarray, l: QLayer, out_scale: float,
             dtype=jnp.bfloat16) -> jnp.ndarray:
    """dequant + bias + relu + quantize-to-next-scale as ONE fused low-
    precision elementwise chain on the int32 accumulator: the dequant and
    requant scales fold into a single per-channel multiplier, and the final
    clip-to-[0,127] subsumes the ReLU. Computing this epilogue in bf16
    instead of f32 halves the VPU/HBM cost of the full-resolution tail
    (measured 2x on the whole int8 forward); the bf16 rounding error
    (~2^-8 relative) is below the 7-bit quantization grid."""
    mult = (l.s_w / out_scale).astype(dtype)
    bias = (l.b / out_scale).astype(dtype)
    y = acc.astype(dtype) * mult + bias
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def _dequant(xq: jnp.ndarray, scale: float, dtype) -> jnp.ndarray:
    return xq.astype(dtype) * jnp.asarray(scale, dtype)


def _up_int8(xq: jnp.ndarray, scale: float, dtype) -> jnp.ndarray:
    """x2 align-corners upsample: lerp directly on the int8 codes in `dtype`
    (lerp commutes with the affine dequant, and a convex combination cannot
    leave the code range), round back to int8 on the SAME scale."""
    y = upsample2x_align_corners(xq.astype(dtype), xq.ndim - 3, xq.ndim - 2)
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def _run_topology(p, x, block):
    """Shared UNet wiring (reference src/models/unetpp.py:93-135): encoder
    chain + plain-chain decoder. `block` handles packing/dtype specifics;
    pooling/upsample/concat dispatch on the tensor dtype. On the int8 path
    decoder concats are passed to `block` as PAIRS and the conv splits its
    input channels instead (see _qconv) — no full-res concat materializes."""
    int8 = x.dtype == jnp.int8
    plain_pool = _maxpool2_int8 if int8 else _maxpool2

    def is_packed(name):
        return p.blocks[name][1].packed

    def pool(name, t):
        """Pool a tensor that `block(name, ..., keep_packed=True)` produced:
        free phase-max if it is actually packed, plain pool otherwise."""
        return phase_max(t) if is_packed(name) else plain_pool(t)

    def full(name, t):
        """Unpack a kept-packed tensor for decoder concat (no-op when the
        layer was never packed). Only valid for keep_packed=True outputs —
        everything else `block` already returns unpacked."""
        return unpack_phases(t) if is_packed(name) else t

    def up(name, t):
        if int8:
            return _up_int8(t, p.scales[f"{name}.relu2"], p.dtype)
        return upsample2x_align_corners(t, t.ndim - 3, t.ndim - 2)

    cat = ((lambda a, b: (a, b)) if int8
           else lambda a, b: jnp.concatenate([a, b], axis=-1))

    x0_0p = block("conv0_0", x, keep_packed=True)
    x1_0p = block("conv1_0", pool("conv0_0", x0_0p), keep_packed=True)
    x2_0 = block("conv2_0", pool("conv1_0", x1_0p))      # unpacked from here on
    x3_0 = block("conv3_0", plain_pool(x2_0))
    x4_0 = block("conv4_0", plain_pool(x3_0))
    x3_1 = block("conv3_1", cat(x3_0, up("conv4_0", x4_0)))
    x2_2 = block("conv2_2", cat(x2_0, up("conv3_1", x3_1)))
    x1_3 = block("conv1_3", cat(full("conv1_0", x1_0p), up("conv2_2", x2_2)))
    return block("conv0_4", cat(full("conv0_0", x0_0p), up("conv1_3", x1_3)),
                 keep_packed=True)


def _maxpool2_int8(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def nested_unet_forward_int8(qp: QParams, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, 3) float in [0, 1] -> logits (B, H, W, num_classes)."""
    sc = qp.scales
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sc["input"]),
                  -127, 127).astype(jnp.int8)

    def block(name, t, keep_packed=False):
        l1, l2 = qp.blocks[name]
        y = _requant(_qconv(t, l1), l1, sc[f"{name}.relu1"], qp.dtype)
        if l1.packed:
            y = unpack_phases(y)
        y = _requant(_qconv(y, l2), l2, sc[f"{name}.relu2"], qp.dtype)
        if l2.packed and not keep_packed:
            y = unpack_phases(y)
        return y

    y = _run_topology(qp, xq, block)

    # bf16 head on the dequantized final activation
    yd = _dequant(y, sc["conv0_4.relu2"], qp.dtype)
    l2 = qp.blocks["conv0_4"][1]
    k = qp.final_w.shape[-1]
    if not l2.packed:
        out = jax.lax.conv_general_dilated(
            yd, qp.final_w.astype(qp.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=qp.dtype)
        return out + qp.final_b.astype(qp.dtype)
    B, h2, w2, c4 = yd.shape
    yk = jnp.einsum("bhwpc,ck->bhwpk", yd.reshape(B, h2, w2, 4, c4 // 4),
                    qp.final_w[0, 0].astype(qp.dtype)) \
        + qp.final_b.astype(qp.dtype)
    return unpack_phases(yk.reshape(B, h2, w2, 4 * k))


def int8_apply(variables: Dict[str, Any], x: jnp.ndarray,
               scales: Tuple[Tuple[str, float], ...],
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """One-call form used by the pipeline (weight prep traced + folded)."""
    return nested_unet_forward_int8(
        prepare_int8_params(variables, scales, dtype), x)
