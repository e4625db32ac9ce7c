"""Sliding-window inference + wrap-uniformity monitor + frame ops tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_patch_origins():
    from unet_tpu.pipeline.sliding_window import _patch_origins
    assert _patch_origins(768, 384, 192) == [0, 192, 384]
    # non-divisible: extra end-aligned window (reference :44-66 semantics)
    assert _patch_origins(800, 384, 192) == [0, 192, 384, 416]


def test_sliding_window_predict():
    from unet_tpu.models import SimpleUNet
    from unet_tpu.pipeline.sliding_window import SlidingWindowInference
    model = SimpleUNet(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sw = SlidingWindowInference(model, variables, patch_size=64, stride=32,
                                target_size=32, num_classes=2)
    img = (np.random.default_rng(0).random((96, 128, 3)) * 255).astype(np.uint8)
    probs = sw.predict(img, use_gating=False)
    assert probs.shape == (96, 128, 2)
    assert np.all(probs >= 0) and np.all(probs <= 1.0001)
    # softmax probs averaged over overlapping windows still sum to 1
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
    # gating with an impossible threshold zeroes everything
    sw2 = SlidingWindowInference(model, variables, patch_size=64, stride=32,
                                 target_size=32, num_classes=2, gate_thr=1.1)
    probs2 = sw2.predict(img, use_gating=True)
    assert np.abs(probs2).max() < 1e-3


def test_apply_hysteresis_matches_golden(rng):
    import cv2
    from unet_tpu.pipeline.sliding_window import apply_hysteresis
    prob = rng.random((48, 64)).astype(np.float32)
    seeds = (prob >= 0.90).astype(np.uint8)
    low = (prob >= 0.70).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    grown = cv2.dilate(seeds, k, iterations=3)
    want = np.logical_or(seeds.astype(bool),
                         np.logical_and(low.astype(bool), grown.astype(bool)))
    got = np.asarray(apply_hysteresis(jnp.asarray(prob)))
    assert np.array_equal(got, want)


def test_filter_by_cc_and_prob(rng):
    import cv2
    from unet_tpu.pipeline.sliding_window import filter_by_cc_and_prob
    mask = np.zeros((48, 64), np.uint8)
    cv2.circle(mask, (15, 20), 6, 1, -1)   # big high-prob blob
    cv2.circle(mask, (45, 30), 6, 1, -1)   # big low-prob blob
    mask[5, 55] = 1                        # tiny blob
    prob = np.zeros((48, 64), np.float32)
    prob[mask > 0] = 0.5
    prob[:30, :30] = 0.95                  # covers first blob
    got = np.asarray(filter_by_cc_and_prob(jnp.asarray(mask), jnp.asarray(prob),
                                           min_area=20, mean_prob_thr=0.85))
    # golden via cv2 loop
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    cleaned = cv2.morphologyEx(cv2.morphologyEx(mask, cv2.MORPH_OPEN, k),
                               cv2.MORPH_CLOSE, k)
    n, lab, st, _ = cv2.connectedComponentsWithStats(cleaned, connectivity=8)
    want = np.zeros_like(cleaned)
    for i in range(1, n):
        if st[i, cv2.CC_STAT_AREA] >= 20 and prob[lab == i].mean() >= 0.85:
            want[lab == i] = 1
    assert np.array_equal(got.astype(np.uint8), want)


def test_scan_thresholds():
    from unet_tpu.pipeline.sliding_window import scan_thresholds
    prob = np.zeros((10, 10, 2), np.float32)
    prob[2:6, 2:6, 1] = 0.8
    gt = np.zeros((10, 10), np.uint8)
    gt[2:6, 2:6] = 1
    res = scan_thresholds([prob], [gt], thr_range=(0.5, 0.95, 0.2))
    assert res[0.5] == 1.0 and res[0.7] == 1.0 and res[0.9] == 0.0


def test_wrap_uniformity_monitor(tmp_path):
    from unet_tpu.inspect import WrapUniformityMonitor
    csvp = tmp_path / "wrap_uniformity.csv"
    mon = WrapUniformityMonitor(window_size=5, csv_path=str(csvp))
    for i in range(4):
        r = mon.update(i, 100.0, 120.0)
        assert r["stats"] is None
    r = mon.update(4, 100.0, 120.0)
    assert r["stats"] is not None and r["is_uniform"]
    assert not r["is_thin"] and not r["is_thick"]
    r = mon.update(5, 100.0, 100.0)  # ratio 1.0 -> thin
    assert r["is_thin"] and not r["is_uniform"]
    r = mon.update(6, 100.0, 170.0)  # ratio 1.7 -> thick
    assert r["is_thick"]
    r = mon.update(7, 0.0, 0.0)      # no measurement
    assert r["ratio"] is None
    lines = open(csvp).readlines()
    assert len(lines) == 9  # header + 8 updates


def test_measure_cable_tape_diameter_px(cable_scene):
    from unet_tpu.inspect import measure_cable_tape_diameter_px
    _, mask = cable_scene
    res = measure_cable_tape_diameter_px(mask)
    assert res is not None
    cable_d, tape_d, delta = res
    assert tape_d > cable_d > 0 and delta == pytest.approx(tape_d - cable_d)
    assert measure_cable_tape_diameter_px(np.zeros((64, 64), np.int32)) is None


@pytest.mark.slow
def test_frames_ops(cable_scene):
    from unet_tpu.ops import frames as F
    bgr, _ = cable_scene
    color_batch = jnp.asarray(bgr[None])
    gray_batch = jnp.asarray(np.repeat(bgr[..., :1], 3, axis=-1)[None])
    assert not bool(F.is_grayscale_frame(color_batch)[0])
    assert bool(F.is_grayscale_frame(gray_batch)[0])
    enhanced = F.conditional_grayscale_enhance(jnp.concatenate([color_batch.astype(jnp.float32),
                                                                gray_batch.astype(jnp.float32)]))
    # color frame untouched; grayscale frame modified
    assert np.allclose(np.asarray(enhanced[0]), bgr.astype(np.float32))
    assert not np.allclose(np.asarray(enhanced[1]), np.asarray(gray_batch[0], dtype=np.float32))

    out, scale = F.resize_for_model(jnp.asarray(bgr), 128)
    assert out.shape == (128, 128, 3)
    mask = (np.random.default_rng(0).random((128, 128)) * 3).astype(np.int32)
    back = F.resize_mask_back(jnp.asarray(mask), bgr.shape[:2], scale)
    assert back.shape == bgr.shape[:2]


@pytest.mark.slow
def test_nlm_denoise_improves_psnr(rng):
    from unet_tpu.ops.frames import nlm_denoise
    clean = np.zeros((48, 64), np.float32)
    clean[:, 20:40] = 180.0
    clean[10:30, :] += 30.0
    noisy = clean + rng.normal(0, 15, clean.shape).astype(np.float32)
    den = np.asarray(nlm_denoise(jnp.asarray(noisy), h=15.0, search=9))
    mse_before = float(((noisy - clean) ** 2).mean())
    mse_after = float(((den - clean) ** 2).mean())
    assert mse_after < mse_before * 0.5  # strong denoising on piecewise scene
