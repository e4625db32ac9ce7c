"""Morphology parity vs OpenCV goldens (ref uses cv2.dilate/erode/morphologyEx,
e.g. reference infer_two_stage_burr.py:78-97)."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import morph


@pytest.mark.parametrize("shape,ksize", [
    (morph.ELLIPSE, (8, 8)), (morph.ELLIPSE, (25, 25)), (morph.ELLIPSE, (3, 3)),
    (morph.ELLIPSE, (2, 2)), (morph.ELLIPSE, (5, 5)), (morph.RECT, (4, 7)),
    (morph.CROSS, (5, 5)),
])
def test_structuring_element(shape, ksize):
    cv_shape = {morph.ELLIPSE: cv2.MORPH_ELLIPSE, morph.RECT: cv2.MORPH_RECT,
                morph.CROSS: cv2.MORPH_CROSS}[shape]
    assert np.array_equal(cv2.getStructuringElement(cv_shape, ksize),
                          morph.structuring_element(shape, ksize))


@pytest.mark.parametrize("ksize", [(3, 3), (8, 8), (2, 2), (5, 5)])
@pytest.mark.parametrize("iterations", [1, 2])
def test_dilate_erode(rng, ksize, iterations):
    m = (rng.random((48, 64)) > 0.7).astype(np.uint8)
    se = morph.structuring_element(morph.ELLIPSE, ksize)
    cv_se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, ksize)
    got = np.asarray(morph.dilate(jnp.asarray(m), se, iterations)).astype(np.uint8)
    want = cv2.dilate(m, cv_se, iterations=iterations)
    assert np.array_equal(got, want)
    got = np.asarray(morph.erode(jnp.asarray(m), se, iterations)).astype(np.uint8)
    want = cv2.erode(m, cv_se, iterations=iterations)
    assert np.array_equal(got, want)


def test_open_close(rng):
    m = (rng.random((48, 64)) > 0.6).astype(np.uint8)
    for k in [(2, 2), (3, 3), (5, 5)]:
        se = morph.structuring_element(morph.ELLIPSE, k)
        cv_se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, k)
        assert np.array_equal(
            np.asarray(morph.open_(jnp.asarray(m), se)).astype(np.uint8),
            cv2.morphologyEx(m, cv2.MORPH_OPEN, cv_se))
        assert np.array_equal(
            np.asarray(morph.close_(jnp.asarray(m), se)).astype(np.uint8),
            cv2.morphologyEx(m, cv2.MORPH_CLOSE, cv_se))


def test_outer_band_matches_reference_band(rng):
    """band = dilate(cable, ellipse8) & ~cable (infer_two_stage_burr.py:78-81)."""
    m = np.zeros((48, 64), np.uint8)
    cv2.circle(m, (30, 24), 10, 1, -1)
    cv_se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (8, 8))
    want = cv2.dilate(m, cv_se) & (~m.astype(bool)).astype(np.uint8)
    got = np.asarray(morph.outer_band(jnp.asarray(m), morph.structuring_element(morph.ELLIPSE, (8, 8)))).astype(np.uint8)
    assert np.array_equal(got, want)


def test_batched_leading_dims(rng):
    m = (rng.random((2, 3, 32, 40)) > 0.7).astype(np.uint8)
    se = morph.structuring_element(morph.ELLIPSE, (3, 3))
    out = np.asarray(morph.dilate(jnp.asarray(m), se))
    cv_se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    for i in range(2):
        for j in range(3):
            assert np.array_equal(out[i, j].astype(np.uint8), cv2.dilate(m[i, j], cv_se))


def test_ring_band_matches_distance_transform():
    """ring_band == distanceTransform band (reference infer_video_robust.py:169-198)."""
    m = np.zeros((48, 64), np.uint8)
    cv2.circle(m, (30, 24), 8, 1, -1)
    r_in, r_out = 2, 10
    dist = cv2.distanceTransform((1 - m).astype(np.uint8), cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    want = (dist > r_in) & (dist <= r_out)
    got = np.asarray(morph.ring_band(jnp.asarray(m), r_in, r_out))
    assert (got == want).mean() > 0.99  # disk-SE vs exact EDT: boundary-pixel tolerance
