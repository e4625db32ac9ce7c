"""Segmentation quality metrics: device confusion matrix, reference-parity
IoU/precision/recall finalization.

The reference computes per-class IoU with host numpy loops over the flat
prediction (reference src/utils/metrics.py:9-127). Here the only O(pixels)
work — the confusion matrix — is one device scatter-add (psum-able across a
mesh for multi-chip eval), and the per-class conventions are finalized from
the (C, C) matrix on host:

  * background (class 0) excluded from the mIoU mean (metrics.py:62-64, 79-81)
  * absent-class convention: GT empty & pred empty -> IoU/precision 1.0,
    recall 1.0; GT empty & pred nonempty -> IoU/precision 0.0
    (metrics.py:51-65)
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(C, C) confusion matrix, rows = target, cols = pred
    (reference src/utils/metrics.py:102-127). One scatter-add; sum across
    batches/devices before finalizing. Targets >= num_classes are dropped
    (JAX out-of-bounds scatter semantics) — used by the train loop to mask
    padded validation samples."""
    t = target.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    flat = t * num_classes + p
    # int32 on device (x64 is off by default); accumulate epochs in int64 on host
    cm = jnp.zeros(num_classes * num_classes, jnp.int32).at[flat].add(1)
    return cm.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray, ignore_index: int = -1
                           ) -> Tuple[float, Dict[int, float], Dict[int, float], Dict[int, float]]:
    """Finalize (mIoU, precision, recall, iou) from a confusion matrix with
    the reference's exact per-class conventions
    (reference src/utils/metrics.py:9-99). Returns the same 4-tuple shape."""
    cm = np.asarray(cm, dtype=np.float64)
    num_classes = cm.shape[0]
    ious_for_mean = []
    precision: Dict[int, float] = {}
    recall: Dict[int, float] = {}
    iou_dict: Dict[int, float] = {}
    for cls in range(num_classes):
        if cls == ignore_index:
            continue
        inter = cm[cls, cls]
        true_n = cm[cls, :].sum()
        pred_n = cm[:, cls].sum()
        is_background = cls == 0
        if true_n == 0:
            iou = 1.0 if pred_n == 0 else 0.0
            iou_dict[cls] = iou
            precision[cls] = 1.0 if pred_n == 0 else 0.0
            recall[cls] = 1.0
            if not is_background:
                ious_for_mean.append(iou)
            continue
        union = pred_n + true_n - inter
        iou = 1.0 if union == 0 else inter / union
        iou_dict[cls] = iou
        if not is_background:
            ious_for_mean.append(iou)
        precision[cls] = (1.0 if true_n == 0 else 0.0) if pred_n == 0 else inter / pred_n
        recall[cls] = inter / true_n
    miou = sum(ious_for_mean) / len(ious_for_mean) if ious_for_mean else 0.0
    return miou, precision, recall, iou_dict


def compute_metrics(pred, target, num_classes: int, ignore_index: int = -1):
    """Drop-in equivalent of reference compute_metrics(pred, target, ...)
    (src/utils/metrics.py:9-99): device confusion matrix + host finalize."""
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(target), num_classes))
    return metrics_from_confusion(cm, ignore_index)


def print_metrics(miou, precision, recall, iou_dict, class_names=None) -> None:
    """Formatted metric table (reference src/utils/metrics.py:130-165)."""
    if class_names is None:
        class_names = {cls: f"class_{cls}" for cls in iou_dict}
    print("\n" + "=" * 60)
    print(f"{'Metrics Summary':^60}")
    print("=" * 60)
    print(f"{'mIoU (Mean IoU):':<30} {miou:.4f}")
    print("-" * 60)
    print(f"{'Class':<15} {'IoU':<12} {'Precision':<12} {'Recall':<12}")
    print("-" * 60)
    for cls_id in sorted(iou_dict):
        name = class_names.get(cls_id, f"class_{cls_id}")
        print(f"{name:<15} {iou_dict[cls_id]:<12.4f} "
              f"{precision.get(cls_id, 0.0):<12.4f} {recall.get(cls_id, 0.0):<12.4f}")
    print("=" * 60 + "\n")
