"""Edge detectors (Sobel / Laplacian / DoG / Canny) as device stencils.

The reference runs these on host per frame via OpenCV:
  * Canny inside the burr band (reference infer_two_stage_burr.py:84-88)
  * multi-scale Canny|Sobel|Laplacian fusion (reference infer_enhanced_burr.py:90-107)
  * Laplacian band threshold (reference src/refactor/burr_detector.py:43-53)
  * DoG alternative (reference src/refactor/burr_detector.py:69-118)

Here each is a fixed small stencil (unrolled shifted adds / separable
correlations) over (..., H, W) float arrays so the whole stage-2 edge stack
fuses into the jit program right after the UNet forward. Canny's hysteresis —
the only data-dependent part — is re-expressed as connected-component labeling
(ops.cc) so it stays fixed-shape and batched.

OpenCV parity notes (verified against cv2 5.0 in tests/test_edges.py):
  * cv2.Sobel/Laplacian default border is BORDER_REFLECT_101
  * cv2.Canny computes Sobel with BORDER_REPLICATE and integer (int16) grads
  * Canny L1 magnitude is |dx|+|dy|; thresholds are floor()ed to ints
  * NMS sector tests use the fixed-point constant TG22 = 13573 / 2**15
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import cc as _cc
from unet_tpu.ops.image import filter1d, filter2d, gaussian_blur

# fixed-point tan(22.5 deg) * 2**15, exactly as in OpenCV's canny.cpp
_TG22 = 13573
_CANNY_SHIFT = 15


def _pad_axis(x: jnp.ndarray, axis: int, before: int, after: int, mode: str) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (before, after)
    if mode == "reflect101":
        return jnp.pad(x, pad, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, pad, mode="edge")
    if mode == "constant":
        return jnp.pad(x, pad, constant_values=0)
    raise ValueError(mode)


def _corr1d(x: jnp.ndarray, kernel: Sequence[float], axis: int, border: str) -> jnp.ndarray:
    """Correlate one axis with a static 1-D kernel (unrolled shifted adds)."""
    k = np.asarray(kernel, dtype=np.float32)
    rb = (len(k) - 1) // 2
    ra = len(k) - 1 - rb
    xp = _pad_axis(x.astype(jnp.float32), axis, rb, ra, border)
    n = x.shape[axis]
    out = None
    for i, w in enumerate(k):
        if w == 0.0:
            continue
        term = jax.lax.slice_in_dim(xp, i, i + n, axis=axis) * float(w)
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x, dtype=jnp.float32)


_SOBEL_DERIV = {1: [-1.0, 0.0, 1.0], 2: [1.0, -2.0, 1.0], 0: [1.0, 2.0, 1.0]}


def sobel(img: jnp.ndarray, dx: int, dy: int, ksize: int = 3,
          border: str = "reflect101") -> jnp.ndarray:
    """cv2.Sobel(..., ksize=3) parity on (..., H, W) single-channel images.

    Returns float32 (the CV_64F path of the reference,
    infer_enhanced_burr.py:95-96). Only ksize=3, dx+dy in {1,2} supported —
    the only configurations the reference uses.
    """
    if ksize != 3:
        raise NotImplementedError("only ksize=3 is used by the reference")
    kx = _SOBEL_DERIV[dx]
    ky = _SOBEL_DERIV[dy]
    out = _corr1d(img, ky, img.ndim - 2, border)
    out = _corr1d(out, kx, img.ndim - 1, border)
    return out


def sobel_magnitude(img: jnp.ndarray, border: str = "reflect101") -> jnp.ndarray:
    """sqrt(Sx^2 + Sy^2) of 3x3 Sobel (reference infer_enhanced_burr.py:95-97)."""
    gx = sobel(img, 1, 0, border=border)
    gy = sobel(img, 0, 1, border=border)
    return jnp.sqrt(gx * gx + gy * gy)


# Laplacian apertures: ksize=1 is the 4-neighbour stencil; ksize=3 is the
# Sobel-composed second-derivative aperture (OpenCV laplacian docs).
_LAP_K1 = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)
_LAP_K3 = np.array([[2, 0, 2], [0, -8, 0], [2, 0, 2]], dtype=np.float32)


def laplacian(img: jnp.ndarray, ksize: int = 1) -> jnp.ndarray:
    """cv2.Laplacian(..., CV_64F) parity, REFLECT_101 border, float32 out."""
    k = {1: _LAP_K1, 3: _LAP_K3}[ksize]
    return filter2d(img, k, channel_dim=False)


def dog(img: jnp.ndarray, ksize1: int = 3, sigma1: float = 1.0,
        ksize2: int = 7, sigma2: float = 2.0) -> jnp.ndarray:
    """Difference of Gaussians with cv2.subtract saturation at 0 for uint8
    semantics (reference src/refactor/burr_detector.py:93-96 operates on
    uint8 blurs, so negatives saturate to 0 before abs)."""
    b1 = jnp.clip(jnp.round(gaussian_blur(img, ksize1, sigma1, channel_dim=False)), 0, 255)
    b2 = jnp.clip(jnp.round(gaussian_blur(img, ksize2, sigma2, channel_dim=False)), 0, 255)
    return jnp.clip(b1 - b2, 0, None)  # cv2.subtract saturates at 0


def uint8_wrap(x: jnp.ndarray) -> jnp.ndarray:
    """float -> uint8 with C-cast semantics (truncate toward 0, wrap mod 256),
    matching `np.abs(lap).astype(np.uint8)` in the reference
    (infer_enhanced_burr.py:101, src/refactor/burr_detector.py:45)."""
    t = jnp.trunc(x)
    return jnp.mod(t.astype(jnp.int32), 256).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Canny
# ---------------------------------------------------------------------------

def _shift2d(x: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    """x shifted so out[r, c] = x[r + dr, c + dc], padded with `fill`."""
    h_ax, w_ax = x.ndim - 2, x.ndim - 1
    out = x
    if dr:
        out = _pad_axis(out, h_ax, max(-dr, 0), max(dr, 0), "constant")
        out = jax.lax.slice_in_dim(out, max(dr, 0), max(dr, 0) + x.shape[h_ax], axis=h_ax)
        if fill != 0:
            idx = jnp.arange(x.shape[h_ax])
            bad = (idx + dr < 0) | (idx + dr >= x.shape[h_ax])
            out = jnp.where(bad.reshape((-1, 1)), fill, out)
    if dc:
        out = _pad_axis(out, w_ax, max(-dc, 0), max(dc, 0), "constant")
        out = jax.lax.slice_in_dim(out, max(dc, 0), max(dc, 0) + x.shape[w_ax], axis=w_ax)
        if fill != 0:
            idx = jnp.arange(x.shape[w_ax])
            bad = (idx + dc < 0) | (idx + dc >= x.shape[w_ax])
            out = jnp.where(bad, fill, out)
    return out


def canny(img: jnp.ndarray, low: float, high: float,
          l2gradient: bool = False, cc_iters: int = 16) -> jnp.ndarray:
    """cv2.Canny parity on (..., H, W) uint8-valued arrays -> bool edge mask.

    Pipeline (mirrors OpenCV's canny.cpp observable behaviour):
      1. int16 Sobel-3 gradients with BORDER_REPLICATE
      2. L1 (|dx|+|dy|) or L2 (dx^2+dy^2 with squared thresholds) magnitude
      3. fixed-point sector NMS with OpenCV's exact strict/non-strict
         neighbour comparisons (left/right: > / >=, up/down: > / >=,
         diagonals: > / >)
      4. hysteresis = connected components of {weak ∪ strong} keeping
         components that contain a strong pixel (ops.cc), replacing the
         host stack-walk with a batched fixed-shape labeling pass

    Used on device by the burr presets (reference infer_two_stage_burr.py:88,
    infer_enhanced_burr.py:92).
    """
    x = jnp.round(img.astype(jnp.float32))
    gx = _corr1d(_corr1d(x, [1.0, 2.0, 1.0], x.ndim - 2, "replicate"),
                 [-1.0, 0.0, 1.0], x.ndim - 1, "replicate").astype(jnp.int32)
    gy = _corr1d(_corr1d(x, [-1.0, 0.0, 1.0], x.ndim - 2, "replicate"),
                 [1.0, 2.0, 1.0], x.ndim - 1, "replicate").astype(jnp.int32)

    if l2gradient:
        mag = gx * gx + gy * gy
        lo = jnp.int32(int(low) * int(low)) if low >= 0 else jnp.int32(0)
        hi = jnp.int32(int(high) * int(high))
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)
        lo = jnp.int32(int(np.floor(low)))
        hi = jnp.int32(int(np.floor(high)))

    ax = jnp.abs(gx)
    ay = jnp.abs(gy) << _CANNY_SHIFT
    tg22x = ax * _TG22
    tg67x = tg22x + ((ax + ax) << _CANNY_SHIFT)

    horiz = ay < tg22x
    vert = ay > tg67x
    diag = jnp.logical_and(jnp.logical_not(horiz), jnp.logical_not(vert))
    s_neg = (gx ^ gy) < 0  # opposite signs -> anti-diagonal neighbours

    m = mag
    left = _shift2d(m, 0, -1, 0)
    right = _shift2d(m, 0, 1, 0)
    up = _shift2d(m, -1, 0, 0)
    down = _shift2d(m, 1, 0, 0)
    up_l = _shift2d(m, -1, -1, 0)
    up_r = _shift2d(m, -1, 1, 0)
    dn_l = _shift2d(m, 1, -1, 0)
    dn_r = _shift2d(m, 1, 1, 0)

    keep_h = jnp.logical_and(m > left, m >= right)
    keep_v = jnp.logical_and(m > up, m >= down)
    # s = -1 when signs differ: compare with up[j-s]=up_r and down[j+s]=dn_l
    keep_d = jnp.where(
        s_neg,
        jnp.logical_and(m > up_r, m > dn_l),
        jnp.logical_and(m > up_l, m > dn_r),
    )
    nms = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_d))
    cand = jnp.logical_and(m > lo, nms)
    strong = jnp.logical_and(cand, m > hi)
    return hysteresis(strong, jnp.logical_and(cand, jnp.logical_not(strong)),
                      cc_iters=cc_iters)


def hysteresis(strong: jnp.ndarray, weak: jnp.ndarray, cc_iters: int = 16,
               pool_iters: int = 16) -> jnp.ndarray:
    """Keep strong pixels plus weak pixels 8-connected (transitively) to a
    strong pixel — OpenCV's stack-walk re-expressed as boolean reachability
    propagation: per outer iteration, `pool_iters` 3x3 or-pools (diagonal /
    short hops, reduce_window is near-free on TPU) then segmented-or scans
    along rows and columns (whole straight runs at once), masked to the
    candidate set. while_loop until fixpoint, bounded by `cc_iters`.
    The scans' Kogge-Stone blocked ladders depend only on the candidate set,
    so they are built once (ops.cc.make_run_scanner) and reused by every
    direction and iteration; pools are near-free vs scans, hence pool-heavy
    iterations (same cost model as ops.cc labeling).

    On TPU the fixpoint runs as ONE Pallas launch (ops/cc_pallas.propagate):
    or-reachability is min-propagation with seeds strong=0 / weak=1 masked to
    the candidate set — the converged value is 0 exactly on pixels whose
    component contains a strong pixel. Unique fixpoint ⇒ bit-identical to
    the XLA while_loop (asserted in tests/test_cc_pallas.py); same routing
    gate and UNET_TPU_CC_PALLAS opt-out as the CC ops."""
    cand = jnp.logical_or(strong, weak)
    H, W = cand.shape[-2:]
    if _cc._pallas_ok(1, H, W):
        from unet_tpu.ops import cc_pallas

        lead = cand.shape[:-2]
        fg = cand.reshape((-1, H, W))
        seed = jnp.where(jnp.logical_and(strong, cand), 0, 1)
        seed = seed.astype(jnp.int32).reshape((-1, 1, H, W))
        out = cc_pallas.propagate(seed, fg, pool_iters=pool_iters,
                                  max_iters=cc_iters, connectivity=8)
        return jnp.logical_and(out[:, 0] == 0, fg).reshape(lead + (H, W))
    lead = cand.shape[:-2]
    scan_c = _cc.make_run_scanner(cand, axis=cand.ndim - 1,
                                  op=jnp.logical_or, fill=False)
    scan_r = _cc.make_run_scanner(cand, axis=cand.ndim - 2,
                                  op=jnp.logical_or, fill=False)

    def or_pool(s):
        return jnp.logical_and(
            jax.lax.reduce_window(s, False, jax.lax.bitwise_or,
                                  (1,) * len(lead) + (3, 3),
                                  (1,) * (len(lead) + 2), "SAME"),
            cand)

    def body(state):
        s, _, i = state
        n = s
        for _ in range(pool_iters):
            n = or_pool(n)
        n = scan_c(n)
        n = scan_r(n)
        return n, jnp.any(n != s), i + 1

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < cc_iters)

    out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.logical_and(strong, cand), jnp.bool_(True), jnp.int32(0)))
    return out
