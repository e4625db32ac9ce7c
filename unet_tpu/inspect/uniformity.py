"""Wrap-uniformity monitoring (tape/cable diameter ratio over time).

Mirrors WrapUniformityDetector (reference infer_wrap_uniformity.py:33-131)
and infer_wrap_7class.py: per-frame ratio = Dt/Dc, THIN/THICK thresholds,
rolling-window std uniformity test, CSV logging.

Also reconstructs the contract of the reference's missing `utils/diameter.py`
(imported by 4 scripts via importlib but absent from the repo — SURVEY §2.5):
`measure_cable_tape_diameter_px(mask, cable_id, tape_id) ->
(cable_d_px, tape_d_px, delta_px) | None`, implemented from the equivalent
logic in src/utils/geometry.py:28-64.
"""
from __future__ import annotations

import csv
from collections import deque
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def measure_cable_tape_diameter_px(mask: np.ndarray, cable_id: int = 1,
                                   tape_id: int = 2, min_valid_rows: int = 10
                                   ) -> Optional[Tuple[float, float, float]]:
    """Median per-row diameters of the largest cable/tape components; None
    when fewer than `min_valid_rows` rows contain both."""
    import jax.numpy as jnp

    from unet_tpu.ops import geometry as _geo

    wc, wt, valid = _geo.diameter_profile(jnp.asarray(mask), cable_id, tape_id)
    valid = np.asarray(valid)
    if valid.sum() < min_valid_rows:
        return None
    wc = np.asarray(wc)
    wt = np.asarray(wt)
    cable_d = float(np.median(wc[valid]))
    tape_d = float(np.median(wt[valid]))
    return cable_d, tape_d, tape_d - cable_d


class WrapUniformityMonitor:
    """Ratio thresholds + sliding-window uniformity
    (reference infer_wrap_uniformity.py:33-131). Feed per-frame (dc, dt)
    scalars (e.g. from the pipeline's device geometry outputs)."""

    def __init__(self, ratio_min: float = 1.05, ratio_max: float = 1.5,
                 window_size: int = 30, std_threshold: float = 0.15,
                 csv_path: Optional[str] = None):
        self.ratio_min = ratio_min
        self.ratio_max = ratio_max
        self.window_size = window_size
        self.std_threshold = std_threshold
        self.ratio_history: deque = deque(maxlen=window_size)
        self.csv_path = csv_path
        if csv_path:
            Path(csv_path).parent.mkdir(parents=True, exist_ok=True)
            with open(csv_path, "w", newline="") as f:
                csv.writer(f).writerow(
                    ["frame_id", "cable_d_px", "tape_d_px", "ratio",
                     "is_thin", "is_thick", "is_uniform", "window_std"])

    def update(self, frame_id: int, cable_d_px: float, tape_d_px: float
               ) -> Dict[str, object]:
        """Returns {ratio, is_thin, is_thick, is_uniform, stats|None}."""
        if cable_d_px <= 0:
            result = dict(ratio=None, is_thin=False, is_thick=False,
                          is_uniform=False, stats=None)
            self._log(frame_id, cable_d_px, tape_d_px, result)
            return result
        ratio = tape_d_px / max(1e-6, cable_d_px)
        is_thin = ratio < self.ratio_min
        is_thick = ratio > self.ratio_max
        self.ratio_history.append(ratio)

        is_uniform = False
        stats = None
        if len(self.ratio_history) >= self.window_size:
            ratios = list(self.ratio_history)
            std = float(np.std(ratios))
            in_range = all(self.ratio_min <= r <= self.ratio_max for r in ratios)
            is_uniform = std < self.std_threshold and in_range
            stats = {"mean": float(np.mean(ratios)), "std": std,
                     "min": float(np.min(ratios)), "max": float(np.max(ratios))}
        result = dict(ratio=ratio, is_thin=is_thin, is_thick=is_thick,
                      is_uniform=is_uniform, stats=stats)
        self._log(frame_id, cable_d_px, tape_d_px, result)
        return result

    def _log(self, frame_id, dc, dt, result) -> None:
        if not self.csv_path:
            return
        stats = result["stats"]
        with open(self.csv_path, "a", newline="") as f:
            csv.writer(f).writerow([
                frame_id, f"{dc:.2f}", f"{dt:.2f}",
                "" if result["ratio"] is None else f"{result['ratio']:.4f}",
                int(result["is_thin"]), int(result["is_thick"]),
                int(result["is_uniform"]),
                "" if stats is None else f"{stats['std']:.4f}"])
