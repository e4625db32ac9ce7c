"""Edge-detector parity vs OpenCV (reference burr stage,
infer_two_stage_burr.py:84-88 and infer_enhanced_burr.py:90-107)."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import edges


def test_sobel_exact(rng):
    g = (rng.random((48, 64)) * 255).astype(np.uint8)
    for dx, dy in [(1, 0), (0, 1)]:
        want = cv2.Sobel(g, cv2.CV_64F, dx, dy, ksize=3)
        got = np.asarray(edges.sobel(jnp.asarray(g, dtype=jnp.float32), dx, dy))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_laplacian_exact(rng):
    g = (rng.random((48, 64)) * 255).astype(np.uint8)
    want = cv2.Laplacian(g, cv2.CV_64F)
    got = np.asarray(edges.laplacian(jnp.asarray(g, dtype=jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sobel_magnitude(rng):
    g = (rng.random((48, 64)) * 255).astype(np.uint8)
    sx = cv2.Sobel(g, cv2.CV_64F, 1, 0, ksize=3)
    sy = cv2.Sobel(g, cv2.CV_64F, 0, 1, ksize=3)
    want = np.sqrt(sx ** 2 + sy ** 2)
    got = np.asarray(edges.sobel_magnitude(jnp.asarray(g, dtype=jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dog_matches_cv2(rng):
    g = (rng.random((48, 64)) * 255).astype(np.uint8)
    b1 = cv2.GaussianBlur(g, (3, 3), 1.0)
    b2 = cv2.GaussianBlur(g, (7, 7), 2.0)
    want = cv2.subtract(b1, b2)
    got = np.asarray(edges.dog(jnp.asarray(g, dtype=jnp.float32)))
    # each blur carries +-1 uint8 rounding slack vs cv2 fixed-point
    assert np.abs(want.astype(float) - got).max() <= 2


@pytest.mark.parametrize("low,high", [(50, 150), (30, 100)])
def test_canny_parity_textured(rng, low, high):
    raw = (rng.random((80, 100)) * 255).astype(np.uint8)
    g = cv2.GaussianBlur(raw, (5, 5), 1.0)
    want = cv2.Canny(g, low, high) > 0
    got = np.asarray(edges.canny(jnp.asarray(g, dtype=jnp.float32), low, high, cc_iters=32))
    assert (want == got).mean() >= 0.999


def test_canny_parity_synthetic_scene(cable_scene):
    bgr, _ = cable_scene
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    g = cv2.GaussianBlur(gray, (5, 5), 1.0)
    want = cv2.Canny(g, 50, 150) > 0
    got = np.asarray(edges.canny(jnp.asarray(g, dtype=jnp.float32), 50, 150, cc_iters=32))
    assert (want == got).mean() >= 0.999


def test_uint8_wrap():
    x = jnp.asarray([0.0, 1.7, 255.0, 256.0, 300.4, -1.0, 511.9])
    got = np.asarray(edges.uint8_wrap(x))
    want = np.array([np.float32(np.int64(v).astype(np.uint8)) if float(v).is_integer()
                     else float(np.uint8(np.int64(np.trunc(v)) % 256)) for v in np.asarray(x)])
    # reference semantics: truncate toward zero then wrap mod 256
    assert got.tolist() == [0.0, 1.0, 255.0, 0.0, 44.0, 255.0, 255.0]
