"""Single-launch Pallas TPU kernel for non-local-means denoising.

Why this exists: the XLA formulation in ops/frames.nlm_denoise is a
`lax.scan` over the (search^2 - 1) window offsets whose body round-trips
~8 full-resolution arrays through HBM per offset (roll, squared diff, two
box-filter passes, exp, two accumulator updates). At the enhanced preset's
800x448 operating point that is ~2 TB of HBM traffic per 96-frame batch —
measured 10.5 FPS end to end when the preset's denoiser became the
mask-faithful NLM (docs/PERF.md §6), vs 200 with bilateral.

This kernel runs the ENTIRE offset loop with the padded frame channel,
both accumulators, and every intermediate resident in VMEM: HBM sees one
read of the input and one write of the output. Per offset the body is
pure VPU work — two dynamic `pltpu.roll`s, squared diff, a 7-tap
separable box sum (log-tree: 3 rolls per axis), `exp`, two FMAs.

Semantics match ops/frames.nlm_denoise (same padded-array box-filter
geometry, same center-weight-1 convention — the (0,0) offset with
exp(0) = 1 IS that convention) up to float summation order; parity is
asserted in tests/test_nlm_pallas.py against the XLA path.

Reference parity contract: cv2.fastNlMeansDenoisingColored(10, 10, 7, 21)
(/root/reference/infer_enhanced_burr.py:58) via frames.nlm_denoise_colored.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM guard: x + num + den + ~4 live temporaries ≈ 7 arrays of the padded
# block against the ~16 MB/core VMEM (the pallas_call below raises the
# scoped budget to 100 MB like ops/cc_pallas.py, but stay conservative).
_MAX_BLOCK_BYTES = int(2.2 * 1024 * 1024)


def _pad_hw(h: int, w: int):
    return ((h + 7) // 8) * 8, ((w + 127) // 128) * 128


def supported(h_pad: int, w_pad: int) -> bool:
    hp, wp = _pad_hw(h_pad, w_pad)
    return hp * wp * 4 <= _MAX_BLOCK_BYTES


def _window_sum(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Sum over the (2r+1)-tap window centred at each element, circular
    reads (valid away from tile edges). Plain roll+add chain — Mosaic
    fuses these into cheap lane shifts."""
    size = x.shape[axis]
    out = x
    for k in range(1, radius + 1):
        out = out + pltpu.roll(x, k % size, axis)
        out = out + pltpu.roll(x, (-k) % size, axis)
    return out


def _kernel(x_ref, out_ref, *, r: int, template: int, inv_h2: float):
    x = x_ref[0]                              # (Hp, Wp) f32, padded
    Hp, Wp = x.shape
    tr = template // 2
    area = float(template * template)
    n_off = (2 * r + 1) ** 2

    def body(i, carry):
        num, den = carry
        dy = i // (2 * r + 1) - r
        dx = i % (2 * r + 1) - r
        shifted = pltpu.roll(pltpu.roll(x, dy % Hp, 0), dx % Wp, 1)
        d2 = (x - shifted) ** 2
        d2 = _window_sum(d2, tr, 0)
        d2 = _window_sum(d2, tr, 1)
        w = jnp.exp(d2 * jnp.float32(-inv_h2 / area))
        return num + w * shifted, den + w

    num, den = jax.lax.fori_loop(
        0, n_off, body, (jnp.zeros_like(x), jnp.zeros_like(x)))
    out_ref[0] = num / den


def nlm_padded(xpad: jnp.ndarray, h: float, template: int, search: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """NLM on an already reflect-padded (B, Hpad, Wpad) f32 stack; returns
    the same padded shape (caller crops). Drop-in for the scan in
    frames.nlm_denoise between its pad and crop."""
    if interpret is None:  # interpret on CPU (tests), compiled on TPU
        interpret = jax.default_backend() != "tpu"
    B, H, W = xpad.shape
    hp, wp = _pad_hw(H, W)
    if (hp, wp) != (H, W):
        xpad = jnp.pad(xpad, ((0, 0), (0, hp - H), (0, wp - W)))
    out = pl.pallas_call(
        functools.partial(_kernel, r=search // 2, template=template,
                          inv_h2=1.0 / (h * h)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hp, wp), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xpad.astype(jnp.float32))
    return out[:, :H, :W]
