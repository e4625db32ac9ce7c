"""Diameter / thickness / defect geometry as batched device reductions.

The reference measures cable+tape geometry per frame on host with Python
row loops and OpenCV (reference src/utils/geometry.py:7-64,
src/utils/geometry_enhanced.py:46-330). Here every measurement is a
fixed-shape reduction over (..., H, W) masks, so a whole frame batch is
measured inside the same jit program as the UNet forward:

  * per-row widths: argmax over the row instead of np.where loops
  * median over valid rows: sort-based masked median
  * largest-CC denoise: ops.cc.largest_component
  * hole analysis: morphological close-diff + ops.cc

Outputs are NamedTuples of arrays (leading batch dims preserved) mirroring
the reference's DiameterMetrics / ThicknessProfile / DefectAnalysis
dataclasses (src/utils/geometry_enhanced.py:18-42, :228-243).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import cc as _cc
from unet_tpu.ops import morph as _morph
from unet_tpu.ops.image import gaussian_kernel1d, filter1d


def width_per_row(mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row horizontal extent (max_x - min_x + 1), 0 for empty rows.

    Parity with reference src/utils/geometry.py:7-18 /
    geometry_enhanced.py:46-80 without the Python row loop.
    mask: (..., H, W) -> (..., H) float32.
    """
    m = mask.astype(jnp.bool_)
    W = m.shape[-1]
    any_row = jnp.any(m, axis=-1)
    first = jnp.argmax(m, axis=-1)
    last = W - 1 - jnp.argmax(jnp.flip(m, axis=-1), axis=-1)
    w = (last - first + 1).astype(jnp.float32)
    return jnp.where(any_row, w, 0.0)


def smooth_widths(widths: jnp.ndarray, ksize: int = 31) -> jnp.ndarray:
    """Gaussian smoothing of a width profile — cv2.GaussianBlur((1, k), 0)
    on the (H, 1) column (reference src/utils/geometry.py:21-25)."""
    if ksize <= 1:
        return widths
    k = ksize if ksize % 2 == 1 else ksize + 1
    return filter1d(widths, gaussian_kernel1d(k, 0.0), axis=widths.ndim - 1)


def masked_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """np.median(x[valid]) with fixed shapes: sort invalid entries to +inf and
    index the (n-1)/2 / n/2 pair. Returns 0.0 when nothing is valid."""
    big = jnp.float32(np.finfo(np.float32).max)
    n = jnp.sum(valid, axis=-1)
    s = jnp.sort(jnp.where(valid, x, big), axis=-1)
    hi_i = jnp.maximum(n // 2, 0)
    lo_i = jnp.maximum((n - 1) // 2, 0)
    lo = jnp.take_along_axis(s, lo_i[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(s, hi_i[..., None], axis=-1)[..., 0]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, 0.0)


class DiameterMetrics(NamedTuple):
    """Device analogue of reference DiameterMetrics
    (src/utils/geometry_enhanced.py:18-34). All fields (...,)-shaped."""
    dc_px: jnp.ndarray
    dt_px: jnp.ndarray
    delta_d_px: jnp.ndarray
    dc_mm: jnp.ndarray
    dt_mm: jnp.ndarray
    delta_d_mm: jnp.ndarray
    valid_rows: jnp.ndarray
    cable_coverage: jnp.ndarray
    tape_coverage: jnp.ndarray


def diameter_metrics(pred_mask: jnp.ndarray, cable_cls: int = 1, tape_cls: int = 2,
                     mm_per_px: float = 0.05, min_valid_rows: int = 20,
                     cc_min_area: int = 50, smooth_ksize: int = 31,
                     denoise: bool = True) -> DiameterMetrics:
    """compute_diameter_metrics parity
    (reference src/utils/geometry_enhanced.py:113-185): largest-CC denoise,
    smoothed per-row widths, median over rows where both cable and tape exist;
    zeroed when fewer than `min_valid_rows` rows are valid."""
    cable = pred_mask == cable_cls
    tape = pred_mask == tape_cls
    if denoise:
        cable = _cc.largest_component(cable, min_area=cc_min_area)
        tape = _cc.largest_component(tape, min_area=cc_min_area)
    return diameter_metrics_from_masks(cable, tape, mm_per_px=mm_per_px,
                                       min_valid_rows=min_valid_rows,
                                       smooth_ksize=smooth_ksize)


def largest_component_lowres(mask_lowres: jnp.ndarray, frame_hw, min_area: int = 50):
    """Largest component computed at model resolution, upscaled to frame
    resolution, with the `min_area` floor applied in FRAME pixels.

    Exact vs frame-resolution largest_component: nearest-neighbour upscaling
    maps every low-res pixel to a block, preserving the component partition
    and the area ORDER (areas scale uniformly), so the largest component is
    the same; the area floor is then evaluated at frame scale."""
    from unet_tpu.ops.image import resize_nearest

    kept = _cc.largest_component(mask_lowres, min_area=0)
    big = resize_nearest(kept, frame_hw, channel_dim=False)
    area = jnp.sum(big, axis=(-2, -1))
    return jnp.logical_and(big, (area >= min_area)[..., None, None])


def diameter_metrics_from_masks(cable: jnp.ndarray, tape: jnp.ndarray,
                                mm_per_px: float = 0.05, min_valid_rows: int = 20,
                                smooth_ksize: int = 31) -> DiameterMetrics:
    """diameter_metrics on pre-denoised binary masks (the pipeline computes
    the largest-CC step at model resolution via largest_component_lowres)."""
    hw = cable.shape[-2] * cable.shape[-1]
    cable_cov = jnp.sum(cable, axis=(-2, -1)) / hw
    tape_cov = jnp.sum(tape, axis=(-2, -1)) / hw

    wc = smooth_widths(width_per_row(cable), smooth_ksize)
    wt = smooth_widths(width_per_row(tape), smooth_ksize)
    valid = jnp.logical_and(wc > 0, wt > 0)
    n_valid = jnp.sum(valid, axis=-1)

    dc = masked_median(wc, valid)
    dt = masked_median(wt, valid)
    enough = n_valid >= min_valid_rows
    dc = jnp.where(enough, dc, 0.0)
    dt = jnp.where(enough, dt, 0.0)
    dd = dt - dc
    return DiameterMetrics(
        dc_px=dc, dt_px=dt, delta_d_px=dd,
        dc_mm=dc * mm_per_px, dt_mm=dt * mm_per_px, delta_d_mm=dd * mm_per_px,
        valid_rows=n_valid, cable_coverage=cable_cov, tape_coverage=tape_cov,
    )


class ThicknessProfile(NamedTuple):
    """Per-row thickness increment (reference geometry_enhanced.py:37-42)."""
    delta_d_mm: jnp.ndarray  # (..., H)
    valid: jnp.ndarray       # (..., H) bool


def thickness_profile(pred_mask: jnp.ndarray, cable_cls: int = 1, tape_cls: int = 2,
                      mm_per_px: float = 0.05, smooth_ksize: int = 31) -> ThicknessProfile:
    """compute_thickness_profile parity (reference geometry_enhanced.py:188-225).
    Note: intentionally no CC denoise, like the reference."""
    wc = smooth_widths(width_per_row(pred_mask == cable_cls), smooth_ksize)
    wt = smooth_widths(width_per_row(pred_mask == tape_cls), smooth_ksize)
    return ThicknessProfile(
        delta_d_mm=(wt - wc) * mm_per_px,
        valid=jnp.logical_and(wc > 0, wt > 0),
    )


def diameter_profile(pred_mask: jnp.ndarray, cable_cls: int, wrap_cls: int,
                     smooth_ksize: int = 31):
    """diameter_profile_from_masks parity (reference src/utils/geometry.py:28-64):
    largest-CC (no area floor), smoothed widths, joint validity.
    Returns (w_cable, w_wrap, valid) with shapes (..., H)."""
    cable = _cc.largest_component(pred_mask == cable_cls)
    wrap = _cc.largest_component(pred_mask == wrap_cls)
    wc = smooth_widths(width_per_row(cable), smooth_ksize)
    ww = smooth_widths(width_per_row(wrap), smooth_ksize)
    return wc, ww, jnp.logical_and(wc > 0, ww > 0)


class DefectAnalysis(NamedTuple):
    """Device analogue of reference DefectAnalysis
    (src/utils/geometry_enhanced.py:228-243)."""
    tape_hole_ratio: jnp.ndarray
    tape_num_holes: jnp.ndarray
    tape_coverage: jnp.ndarray
    cable_num_components: jnp.ndarray
    tape_num_components: jnp.ndarray
    tape_largest_area_ratio: jnp.ndarray
    defect_areas: jnp.ndarray        # (..., n_defect_classes)
    total_defect_area: jnp.ndarray


def analyze_defects(pred_mask: jnp.ndarray, cable_cls: int = 1, tape_cls: int = 2,
                    defect_classes: Sequence[int] = (3, 4, 5, 6),
                    hole_min_size: int = 10,
                    max_components: int = 64) -> DefectAnalysis:
    """analyze_defects parity (reference geometry_enhanced.py:246-330):
    holes = close(tape, ellipse5) - tape, filtered by `hole_min_size`;
    component counts capped at `max_components` (fixed-shape bound)."""
    tape = pred_mask == tape_cls
    cable = pred_mask == cable_cls
    hw = pred_mask.shape[-2] * pred_mask.shape[-1]
    tape_area = jnp.sum(tape, axis=(-2, -1))
    tape_cov = tape_area / hw

    se5 = _morph.structuring_element(_morph.ELLIPSE, (5, 5))
    holes = jnp.logical_and(_morph.close_(tape, se5), jnp.logical_not(tape))
    hole_labels = _cc.connected_components(holes)
    hole_stats = _cc.component_stats(hole_labels, max_components)
    hole_ok = jnp.logical_and(hole_stats.valid, hole_stats.area >= hole_min_size)
    num_holes = jnp.sum(hole_ok, axis=-1)
    hole_area = jnp.sum(jnp.where(hole_ok, hole_stats.area, 0), axis=-1)
    hole_ratio = hole_area / jnp.maximum(tape_area, 1)

    tape_labels = _cc.connected_components(tape)
    tape_stats = _cc.component_stats(tape_labels, max_components)
    tape_ncc = tape_stats.num
    largest = jnp.max(jnp.where(tape_stats.valid, tape_stats.area, 0), axis=-1)
    largest_ratio = jnp.where(tape_ncc > 0,
                              largest / jnp.maximum(tape_area, 1), 0.0)

    cable_ncc = _cc.count_components(cable, max_components=max_components)

    d_areas = jnp.stack([jnp.sum(pred_mask == c, axis=(-2, -1)) for c in defect_classes], axis=-1)
    return DefectAnalysis(
        tape_hole_ratio=hole_ratio,
        tape_num_holes=num_holes,
        tape_coverage=tape_cov,
        cable_num_components=cable_ncc,
        tape_num_components=tape_ncc,
        tape_largest_area_ratio=largest_ratio,
        defect_areas=d_areas,
        total_defect_area=jnp.sum(d_areas, axis=-1),
    )
