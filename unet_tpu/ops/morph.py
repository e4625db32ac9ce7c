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


def dilate(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate on a binary mask (border behaves like cv2's default)."""
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
        out = _hit_count(out, se, 0.0) > 0.5
    return out


def erode(mask: jnp.ndarray, se: np.ndarray, iterations: int = 1) -> jnp.ndarray:
    """cv2.erode on a binary mask (outside-image treated as foreground,
    matching cv2's +inf default borderValue)."""
    n = float(np.asarray(se, dtype=np.float32).sum())
    out = mask.astype(jnp.bool_)
    for _ in range(iterations):
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
