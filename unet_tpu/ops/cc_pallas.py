"""Single-launch Pallas TPU kernel for connected-component label propagation.

Why this exists: the XLA formulation in ops/cc.py (`_cc_single` /
`_cc_bbox_single`) is a `while_loop` whose body issues ~50 kernels per
iteration (min-pools + two Kogge-Stone segmented-scan ladders). On hardware
with a per-kernel launch floor (docs/PERF.md §1 measures ~1 ms/launch on the
dev relay; even production TPUs pay ~2-5 us each) the burr-filter CC stage is
launch-bound, not compute-bound: the bisection in
docs/experiments/bisect_enhanced.py attributes ~77 ms of the enhanced
preset's 172 ms/batch-16 to it.

This kernel runs the ENTIRE fixpoint — `pool_iters` masked 3x3 min-pool
sweeps followed by row/column segmented run-min scans, iterated to
convergence — inside ONE `pallas_call`, with the (C, H, W) propagation state
resident in VMEM. All data movement is `pltpu.roll` + `jnp.where` on
full blocks (VPU work, no scatter/gather), so per-iteration cost is a few
hundred microseconds instead of ~50 launches.

Semantics are bit-identical to the XLA path: min-propagation converges to a
unique fixpoint (each channel's value = min over the connected component),
independent of sweep schedule. Parity is asserted in
tests/test_cc_pallas.py against ops/cc.py on identical masks.

Reference parity contract: the consumers (ops/cc.py
`filter_components_by_geometry`, `connected_components`) mirror the
reference's cv2.connectedComponentsWithStats gates
(/root/reference/infer_two_stage_burr.py:100-119).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT32_MAX = np.iinfo(np.int32).max

# VMEM guard: the while carry holds prev+next state plus step temporaries
# (~3x the state array at peak), against the ~16 MB/core VMEM. 5.5 MB of
# state admits the shipped hot shapes (burr crop 448x512 C=5 = 4.6 MB,
# model-res 512^2 C=5 = 5.2 MB, frame-res C=1 labels) and was verified to
# compile on v5e; bigger masks fall back to the XLA path.
_MAX_STATE_BYTES = int(5.5 * 1024 * 1024)


def _pad_hw(h: int, w: int):
    return ((h + 7) // 8) * 8, ((w + 127) // 128) * 128


def supported(c: int, h: int, w: int) -> bool:
    hp, wp = _pad_hw(h, w)
    return c * hp * wp * 4 <= _MAX_STATE_BYTES


def _shift(x: jnp.ndarray, d: int, axis: int, fill, size: int,
           idx: jnp.ndarray) -> jnp.ndarray:
    """Non-circular shift by +d along `axis` (value comes from index-d);
    vacated positions filled with `fill`. `idx` is the broadcasted iota
    along `axis` with x's rank."""
    rolled = pltpu.roll(x, d % size, axis)  # pltpu.roll wants shift >= 0
    if d >= 0:
        valid = idx >= d
    else:
        valid = idx < size + d
    return jnp.where(valid, rolled, fill)


def _kernel(fg_ref, state_ref, out_ref, *, pool_iters: int, max_iters: int,
            connectivity: int):
    fgi = fg_ref[0]                          # (H, W) int32 0/1 — Mosaic can
    fg = fgi > 0                             # only roll 32-bit vectors, so
    state0 = state_ref[0]                    # anything shifted stays i32
    C, H, W = state0.shape
    inf = jnp.int32(_INT32_MAX)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = row2[None]
    col = col2[None]
    fgC = jnp.broadcast_to(fg[None], (C, H, W))

    def masked(s):
        return jnp.where(fgC, s, inf)

    def pool(s):
        """One masked 3x3 (or cross) min-pool step == ops/cc.py _min_pool."""
        m = masked(s)
        up = _shift(m, 1, 1, inf, H, row)
        dn = _shift(m, -1, 1, inf, H, row)
        if connectivity == 8:
            # separable: vertical 3-tap then horizontal 3-tap == 3x3 window
            v = jnp.minimum(jnp.minimum(m, up), dn)
            lf = _shift(v, 1, 2, inf, W, col)
            rt = _shift(v, -1, 2, inf, W, col)
            o = jnp.minimum(jnp.minimum(v, lf), rt)
        else:
            lf = _shift(m, 1, 2, inf, W, col)
            rt = _shift(m, -1, 2, inf, W, col)
            o = jnp.minimum(jnp.minimum(jnp.minimum(m, up),
                                        jnp.minimum(dn, lf)), rt)
        return jnp.where(fgC, jnp.minimum(o, m), s)

    def _directional(m, axis, sign, size, idx, idx2):
        """Inclusive segmented-min Kogge-Stone scan towards +/-1 along
        `axis`. Flags are i32 (1 = segment boundary at this element) because
        Mosaic only rolls 32-bit lanes."""
        nb = _shift(fgi, sign, axis - 1, 0, size, idx2)  # neighbour fg
        f = jnp.where(jnp.logical_and(fg, nb > 0), 0, 1).astype(jnp.int32)
        v = m
        d = 1
        while d < size:
            vv = _shift(v, sign * d, axis, inf, size, idx)
            ff = _shift(f, sign * d, axis - 1, 1, size, idx2)
            v = jnp.where(jnp.broadcast_to((f > 0)[None], v.shape), v,
                          jnp.minimum(vv, v))
            f = jnp.maximum(f, ff)
            d *= 2
        return v

    def run_min(s, axis):
        """Segmented min over contiguous fg runs along `axis` (both
        directions) == ops/cc.py make_run_scanner's contract. The backward
        scan runs on the forward-scanned values (prefix-min of prefix-min is
        still the run-min) so only one value array is live at a time."""
        size = H if axis == 1 else W
        idx = row if axis == 1 else col
        idx2 = row2 if axis == 1 else col2
        m = _directional(masked(s), axis, 1, size, idx, idx2)
        m = _directional(m, axis, -1, size, idx, idx2)
        return jnp.where(fgC, m, s)

    def body(carry):
        s, _, i = carry
        m = s
        for _ in range(pool_iters):
            m = pool(m)
        m = run_min(m, axis=2)
        m = run_min(m, axis=1)
        return m, jnp.any(m != s), i + 1

    def cond(carry):
        _, changed, i = carry
        return jnp.logical_and(changed, i < max_iters)

    final, _, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.bool_(True), jnp.int32(0)))
    out_ref[0] = final


def propagate(state0: jnp.ndarray, fg: jnp.ndarray, *, pool_iters: int,
              max_iters: int, connectivity: int = 8,
              interpret: bool | None = None) -> jnp.ndarray:
    """Run the CC min-propagation fixpoint in one kernel launch.

    state0: (B, C, H, W) int32 seed values (label / bbox / rank channels).
    fg:     (B, H, W) bool foreground mask.
    Returns the converged (B, C, H, W) state. Background pixels keep their
    seed values, exactly like the XLA path.
    """
    if interpret is None:  # interpret on CPU (tests), compiled on TPU
        interpret = jax.default_backend() != "tpu"
    B, C, H, W = state0.shape
    hp, wp = _pad_hw(H, W)
    if (hp, wp) != (H, W):
        state0 = jnp.pad(state0, ((0, 0), (0, 0), (0, hp - H), (0, wp - W)))
        fg = jnp.pad(fg, ((0, 0), (0, hp - H), (0, wp - W)))
    out = pl.pallas_call(
        functools.partial(_kernel, pool_iters=pool_iters, max_iters=max_iters,
                          connectivity=connectivity),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hp, wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, hp, wp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, hp, wp), jnp.int32),
        # the state block is consumed in place; aliasing halves the VMEM
        # block footprint (5-channel 448x512 blocks OOM'd the default 16 MB
        # scoped budget otherwise)
        input_output_aliases={1: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fg.astype(jnp.int32), state0)
    return out[:, :, :H, :W]
