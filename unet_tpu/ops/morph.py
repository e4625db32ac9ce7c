"""Binary morphology as XLA convolutions.

The reference does all morphology on host with OpenCV
(cv2.dilate/erode/morphologyEx, e.g. reference infer_two_stage_burr.py:78-97,
src/refactor/burr_detector.py:28-47, src/refactor/postprocess.py:144-166).
On TPU a binary dilation is exactly `conv(mask, SE) > 0` and an erosion is
its dual — one MXU-friendly convolution per op, batched over frames, instead
of a per-frame host round-trip.

Structuring elements replicate cv2.getStructuringElement bit-for-bit
(including the MORPH_ELLIPSE rasterization and even-size anchor convention).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

RECT = "rect"
ELLIPSE = "ellipse"
CROSS = "cross"


def structuring_element(shape: str, ksize: Sequence[int]) -> np.ndarray:
    """cv2.getStructuringElement parity. `ksize` = (width, height) like cv2."""
    w, h = int(ksize[0]), int(ksize[1])
    if shape == RECT:
        return np.ones((h, w), dtype=np.uint8)
    if shape == CROSS:
        e = np.zeros((h, w), dtype=np.uint8)
        e[h // 2, :] = 1
        e[:, w // 2] = 1
        return e
    if shape == ELLIPSE:
        e = np.zeros((h, w), dtype=np.uint8)
        r, c = h // 2, w // 2
        inv_r2 = 1.0 / (r * r) if r else 0.0
        for i in range(h):
            dy = i - r
            if abs(dy) <= r:
                # cvRound == round-half-to-even == np.round
                dx = int(np.round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
                j1, j2 = max(c - dx, 0), min(c + dx + 1, w)
                e[i, j1:j2] = 1
        return e
    raise ValueError(f"unknown SE shape {shape!r}")


def ellipse_kernel(w: int, h: int | None = None) -> np.ndarray:
    return structuring_element(ELLIPSE, (w, h if h is not None else w))


def disk_kernel(radius: int) -> np.ndarray:
    """Euclidean disk of given radius: x^2 + y^2 <= r^2. Dilation by this SE
    equals thresholding the Euclidean distance transform at `radius`, which is
    how `ring_band` replaces cv2.distanceTransform band tests
    (reference infer_video_robust.py:169-198)."""
    r = int(radius)
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


def _hit_count(mask: jnp.ndarray, se: np.ndarray, pad_value: float) -> jnp.ndarray:
    """conv(mask, SE) with cv2's anchor convention; returns float counts.

    mask: (..., H, W) bool/numeric. The anchor is (kh//2, kw//2), so for
    even-sized SEs padding is asymmetric exactly like OpenCV.
    """
    se_f = np.asarray(se, dtype=np.float32)
    kh, kw = se_f.shape
    ay, ax = kh // 2, kw // 2
    lead = mask.shape[:-2]
    H, W = mask.shape[-2:]
    x = mask.reshape((-1, H, W, 1)).astype(jnp.float32)
    if pad_value != 0.0:
        pad = [(0, 0), (ay, kh - 1 - ay), (ax, kw - 1 - ax), (0, 0)]
        x = jnp.pad(x, pad, constant_values=pad_value)
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(ay, kh - 1 - ay), (ax, kw - 1 - ax)]
    kern = jnp.asarray(se_f.reshape(kh, kw, 1, 1))
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(lead + (H, W))


def _row_runs(se: np.ndarray):
    """Decompose an SE into per-row contiguous runs (dy, left, width) around
    the cv2 anchor, or None if any row is non-contiguous. Ellipse/rect/cross/
    disk SEs all decompose, turning a KxK binary dilation into K cheap
    horizontal reduce_windows + vertical shifts instead of a KxK conv."""
    se = np.asarray(se)
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    runs = []
    for i in range(kh):
        cols = np.nonzero(se[i])[0]
        if len(cols) == 0:
            continue
        if cols[-1] - cols[0] + 1 != len(cols):
            return None
        runs.append((i - ay, int(cols[0]) - ax, len(cols)))
    return runs


def _dilate_runs(mask: jnp.ndarray, runs) -> jnp.ndarray:
    """OR of horizontally-windowed, vertically-shifted copies.
    out[r, c] = any(mask[r+dy, c+left : c+left+w]) over runs."""
    H, W = mask.shape[-2:]
    h_ax, w_ax = mask.ndim - 2, mask.ndim - 1
    out = None
    for dy, left, w in runs:
        # horizontal window [c+left, c+left+w) with out-of-range = False:
        # zero-pad so every tap is in range, reduce_window VALID, re-align.
        hi = left + w - 1
        pw = [(0, 0)] * mask.ndim
        pw[w_ax] = (max(-left, 0), max(hi, 0))
        xp = jnp.pad(mask, pw)
        win = jax.lax.reduce_window(
            xp, False, jax.lax.bitwise_or,
            tuple(1 if a != w_ax else w for a in range(mask.ndim)),
            (1,) * mask.ndim, "VALID")
        # xp[i] = mask[i - Lpad] -> win[j] = any(mask[j - Lpad : j - Lpad + w]);
        # out[c] = win[c + left + Lpad] with Lpad = max(-left, 0)
        start = max(left, 0)
        win = jax.lax.slice_in_dim(win, start, start + W, axis=w_ax)
        if dy:
            # out[r] = win[r + dy] with out-of-range rows = False
            ph = [(0, 0)] * mask.ndim
            ph[h_ax] = (max(-dy, 0), max(dy, 0))
            win = jnp.pad(win, ph)
            win = jax.lax.slice_in_dim(win, max(dy, 0), max(dy, 0) + H, axis=h_ax)
        out = win if out is None else jnp.logical_or(out, win)
    return out


def dilate(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate on a binary mask (border behaves like cv2's default)."""
    out = mask.astype(jnp.bool_)
    runs = _row_runs(se)
    for _ in range(iterations):
        if runs is not None:
            out = _dilate_runs(out, runs)
        else:
            out = _hit_count(out, se, 0.0) > 0.5
    return out


def erode(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.erode on a binary mask (outside-image treated as foreground,
    matching cv2's +inf default borderValue). cv2 applies erode and dilate
    with the same anchor-offset formula, so erosion = NOT dilate(NOT x) with
    the SAME run decomposition (zero padding of the complement = +inf border)
    — verified for even and odd SEs against cv2."""
    runs = _row_runs(np.asarray(se))
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        if runs is not None:
            out = jnp.logical_not(_dilate_runs(jnp.logical_not(out), runs))
        else:
            n = float(np.asarray(se, np.float32).sum())
            out = _hit_count(out, se, 1.0) > n - 0.5
    return out


def open_(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """cv2.morphologyEx MORPH_OPEN = dilate(erode(x))."""
    return dilate(erode(mask, se), se)


def close_(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """cv2.morphologyEx MORPH_CLOSE = erode(dilate(x))."""
    return erode(dilate(mask, se), se)


def gradient(mask: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    """Morphological gradient: dilate - erode (boundary band)."""
    return jnp.logical_and(dilate(mask, se), jnp.logical_not(erode(mask, se)))


def outer_band(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """dilate(mask) & ~mask — the burr detection band
    (reference infer_two_stage_burr.py:78-81)."""
    return jnp.logical_and(dilate(mask, se, iterations), jnp.logical_not(mask.astype(jnp.bool_)))


def ring_band(mask: jnp.ndarray, r_in: int, r_out: int) -> jnp.ndarray:
    """Pixels whose Euclidean distance to `mask` lies in (r_in, r_out]:
    dilate(disk r_out) & ~dilate(disk r_in). Replaces the reference's
    cv2.distanceTransform band [min_gap, max_gap]
    (reference infer_video_robust.py:169-198, src/refactor/postprocess.py:79-118)."""
    outer = dilate(mask, disk_kernel(r_out))
    inner = dilate(mask, disk_kernel(r_in)) if r_in > 0 else mask.astype(jnp.bool_)
    return jnp.logical_and(outer, jnp.logical_not(inner))
