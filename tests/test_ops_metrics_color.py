"""Segmentation metrics + color conversion parity."""
import cv2
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import color, seg_metrics


def _reference_metrics(pred, target, num_classes, ignore_index=-1):
    """Direct numpy implementation of the reference conventions
    (src/utils/metrics.py:9-99) as the golden."""
    p, t = pred.reshape(-1), target.reshape(-1)
    ious, prec, rec, ioud = [], {}, {}, {}
    for c in range(num_classes):
        if c == ignore_index:
            continue
        tc, pc = t == c, p == c
        bg = c == 0
        if tc.sum() == 0:
            iou = 1.0 if pc.sum() == 0 else 0.0
            ioud[c] = iou
            prec[c] = 1.0 if pc.sum() == 0 else 0.0
            rec[c] = 1.0
            if not bg:
                ious.append(iou)
            continue
        inter = (pc & tc).sum()
        union = (pc | tc).sum()
        iou = 1.0 if union == 0 else inter / union
        ioud[c] = iou
        if not bg:
            ious.append(iou)
        prec[c] = (1.0 if tc.sum() == 0 else 0.0) if pc.sum() == 0 else inter / pc.sum()
        rec[c] = inter / tc.sum()
    return (sum(ious) / len(ious) if ious else 0.0), prec, rec, ioud


def test_metrics_parity(rng):
    pred = (rng.random((2, 32, 32)) * 4).astype(np.int32)
    target = (rng.random((2, 32, 32)) * 4).astype(np.int32)
    want = _reference_metrics(pred, target, 4)
    got = seg_metrics.compute_metrics(pred, target, 4)
    assert abs(got[0] - want[0]) < 1e-9
    for k in want[3]:
        assert abs(got[3][k] - want[3][k]) < 1e-9
        assert abs(got[1][k] - want[1][k]) < 1e-9
        assert abs(got[2][k] - want[2][k]) < 1e-9


def test_metrics_absent_class(rng):
    pred = np.zeros((16, 16), np.int32)
    target = np.zeros((16, 16), np.int32)
    miou, prec, rec, ioud = seg_metrics.compute_metrics(pred, target, 3)
    # classes 1,2 absent in both -> IoU 1.0, mIoU 1.0
    assert miou == 1.0 and ioud[1] == 1.0 and ioud[2] == 1.0
    pred2 = pred.copy()
    pred2[0, 0] = 1  # false positive on absent class
    miou2, _, _, ioud2 = seg_metrics.compute_metrics(pred2, target, 3)
    assert ioud2[1] == 0.0 and miou2 == 0.5


def test_confusion_matrix(rng):
    pred = (rng.random((32, 32)) * 3).astype(np.int32)
    target = (rng.random((32, 32)) * 3).astype(np.int32)
    got = np.asarray(seg_metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 3))
    want = np.zeros((3, 3), np.int64)
    for tt, pp in zip(target.reshape(-1), pred.reshape(-1)):
        want[tt, pp] += 1
    assert np.array_equal(got, want)


def test_bgr2gray_parity(rng):
    img = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    got = np.asarray(color.bgr2gray(jnp.asarray(img)))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_bgr2rgb(rng):
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    assert np.array_equal(np.asarray(color.bgr2rgb(jnp.asarray(img))),
                          cv2.cvtColor(img, cv2.COLOR_BGR2RGB))


def test_gamma_lut(rng):
    img = (rng.random((16, 16)) * 255).astype(np.uint8)
    gamma = 1.5
    lut = np.clip(np.round(((np.arange(256) / 255.0) ** (1.0 / gamma)) * 255.0), 0, 255).astype(np.uint8)
    want = lut[img]
    got = np.asarray(color.gamma_lut(jnp.asarray(img), gamma))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1
