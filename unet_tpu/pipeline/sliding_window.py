"""Sliding-window patch inference for high-resolution defect detection.

TPU-first redesign of the reference's sequential patch loop
(tools/inference_binary_optimized.py:21-113): every window of the frame is
extracted with static slices and pushed through ONE batched forward (the
MXU sees a (n_patches, 256, 256, 3) batch instead of n_patches separate
1-image calls), then window gating, overlap-averaged probability fusion,
hysteresis seed-growing (:116-136), and the CC + mean-probability filter
(:139-176) all run as fixed-shape device ops.

This is the domain's "sequence parallelism" analogue (SURVEY §5): spatial
scale handled by batched tiling rather than host loops.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import cc as _cc
from unet_tpu.ops import image as _image
from unet_tpu.ops import morph as _morph


def _patch_origins(size: int, patch: int, stride: int) -> List[int]:
    """cv2-loop origin semantics (reference :44-66): stride steps plus a
    final end-aligned window when the stride doesn't divide evenly."""
    n = (size - patch) // stride + 1
    origins = [i * stride for i in range(n)]
    if (size - patch) % stride != 0:
        origins.append(size - patch)
    return origins


class SlidingWindowInference:
    def __init__(self, model, variables, patch_size: int = 384, stride: int = 192,
                 target_size: int = 256, num_classes: int = 2,
                 gate_thr: float = 0.70, defect_cls: int = 1,
                 batch_chunk: int = 64):
        self.model = model
        self.variables = variables
        self.patch_size = patch_size
        self.stride = stride
        self.target_size = target_size
        self.num_classes = num_classes
        self.gate_thr = gate_thr
        self.defect_cls = defect_cls
        self.batch_chunk = batch_chunk
        self._jit_cache: Dict[Tuple[int, int, bool], Any] = {}

    def _build(self, h: int, w: int, use_gating: bool):
        ys = _patch_origins(h, self.patch_size, self.stride)
        xs = _patch_origins(w, self.patch_size, self.stride)
        origins = [(y, x) for y in ys for x in xs]
        p, t, c = self.patch_size, self.target_size, self.num_classes

        def run(variables, image):
            img = image.astype(jnp.float32)
            patches = jnp.stack([
                jax.lax.dynamic_slice(img, (y, x, 0), (p, p, 3))
                for (y, x) in origins])
            small = _image.resize_bilinear(patches, (t, t)) / 255.0

            logits_parts = []
            for s in range(0, len(origins), self.batch_chunk):
                out = self.model.apply(variables, small[s:s + self.batch_chunk],
                                       train=False)
                if isinstance(out, (list, tuple)):
                    out = out[-1]
                logits_parts.append(out)
            logits = jnp.concatenate(logits_parts, axis=0)
            probs = jax.nn.softmax(logits, axis=-1)              # (N, t, t, C)

            if use_gating:
                gate = jnp.max(probs[..., self.defect_cls], axis=(-2, -1))
                weight = (gate >= self.gate_thr).astype(jnp.float32)
            else:
                weight = jnp.ones((len(origins),), jnp.float32)

            up = _image.resize_bilinear(probs, (p, p))           # (N, p, p, C)
            output = jnp.zeros((h, w, c), jnp.float32)
            count = jnp.zeros((h, w, 1), jnp.float32)
            for i, (y, x) in enumerate(origins):
                wgt = weight[i]
                output = jax.lax.dynamic_update_slice(
                    output,
                    jax.lax.dynamic_slice(output, (y, x, 0), (p, p, c))
                    + up[i] * wgt, (y, x, 0))
                count = jax.lax.dynamic_update_slice(
                    count,
                    jax.lax.dynamic_slice(count, (y, x, 0), (p, p, 1)) + wgt,
                    (y, x, 0))
            return output / (count + 1e-8)

        return jax.jit(run)

    def predict(self, image: np.ndarray, use_gating: bool = True) -> np.ndarray:
        """image (H, W, 3) uint8 -> (H, W, num_classes) overlap-averaged probs
        (windows whose gate score is below gate_thr contribute nothing)."""
        h, w = image.shape[:2]
        key = (h, w, use_gating)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(h, w, use_gating)
        return np.asarray(self._jit_cache[key](self.variables, jnp.asarray(image)))


def apply_hysteresis(prob_map: jnp.ndarray, thr_high: float = 0.90,
                     thr_low: float = 0.70) -> jnp.ndarray:
    """Seed-grow thresholding (reference :116-136): high-threshold seeds,
    low-threshold pixels kept only within 3 dilations (ellipse 5) of a seed."""
    seeds = prob_map >= thr_high
    low = prob_map >= thr_low
    grown = _morph.dilate(seeds, _morph.ellipse_kernel(5), iterations=3)
    return jnp.logical_or(seeds, jnp.logical_and(low, grown))


def filter_by_cc_and_prob(pred_mask: jnp.ndarray, prob_map: jnp.ndarray,
                          min_area: int = 50, mean_prob_thr: float = 0.85
                          ) -> jnp.ndarray:
    """Morphological open+close then keep components with area >= min_area
    AND mean probability >= mean_prob_thr (reference :139-176)."""
    se3 = _morph.ellipse_kernel(3)
    cleaned = _morph.close_(_morph.open_(pred_mask, se3), se3)

    def single(m, prob):
        H, W = m.shape
        hw = H * W
        labels = _cc.connected_components(m)
        labf = labels.reshape(-1)
        fg = labf >= 0
        bins = jnp.where(fg, labf, hw)
        ones = jnp.where(fg, 1, 0)
        areas = jnp.zeros(hw + 1, jnp.int32).at[bins].add(ones)
        psum = jnp.zeros(hw + 1, jnp.float32).at[bins].add(
            jnp.where(fg, prob.reshape(-1), 0.0))
        area_px = areas[bins].reshape(H, W)
        mean_px = (psum[bins] / jnp.maximum(areas[bins], 1)).reshape(H, W)
        keep = jnp.logical_and(area_px >= min_area, mean_px >= mean_prob_thr)
        return jnp.logical_and(m, keep)

    return _cc._batched(single, cleaned.astype(jnp.bool_), prob_map)


def scan_thresholds(prob_maps: List[np.ndarray], gt_masks: List[np.ndarray],
                    thr_range: Tuple[float, float, float] = (0.50, 0.99, 0.01),
                    defect_cls: int = 1) -> Dict[float, float]:
    """Threshold-scanning harness over precomputed probability maps
    (reference scan_thresholds, :179+): returns {threshold: mean defect IoU}."""
    lo, hi, step = thr_range
    out: Dict[float, float] = {}
    for thr in np.arange(lo, hi, step):
        ious = []
        for probs, gt in zip(prob_maps, gt_masks):
            pred = probs[..., defect_cls] >= thr
            gtb = gt > 0
            union = np.logical_or(pred, gtb).sum()
            iou = 1.0 if union == 0 else np.logical_and(pred, gtb).sum() / union
            ious.append(iou)
        out[round(float(thr), 4)] = float(np.mean(ious))
    return out
