"""Resize / rotate / blur / letterbox parity vs OpenCV + torch goldens."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import image


@pytest.mark.parametrize("src,dst", [((37, 53), (96, 128)), ((100, 80), (50, 40)),
                                     ((448, 300), (512, 512))])
def test_resize_bilinear_uint8(rng, src, dst):
    img = (rng.random(src + (3,)) * 255).astype(np.uint8)
    want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(image.resize_bilinear(jnp.asarray(img), dst))
    # cv2's uint8 path is fixed-point (15-bit weights + banker's rounding);
    # a float implementation lands within +-1 everywhere, differing on a
    # platform-dependent ~5-15% of pixels
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.2


def test_resize_bilinear_float(rng):
    img = rng.random((40, 56)).astype(np.float32)
    want = cv2.resize(img, (80, 64), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(image.resize_bilinear(jnp.asarray(img), (64, 80)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("src,dst", [((37, 53), (96, 128)), ((100, 80), (50, 40))])
def test_resize_nearest(rng, src, dst):
    img = (rng.random(src) * 6).astype(np.uint8)  # mask-like
    want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(image.resize_nearest(jnp.asarray(img), dst))
    assert np.array_equal(got, want)


def test_rotate90(rng):
    img = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
    assert np.array_equal(np.asarray(image.rotate90_ccw(jnp.asarray(img))),
                          cv2.rotate(img, cv2.ROTATE_90_COUNTERCLOCKWISE))
    assert np.array_equal(np.asarray(image.rotate90_cw(jnp.asarray(img))),
                          cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE))


@pytest.mark.parametrize("ksize,sigma", [(5, 1.0), (3, 0.0), (5, 0.0), (7, 2.0)])
def test_gaussian_blur(rng, ksize, sigma):
    img = (rng.random((48, 64)) * 255).astype(np.uint8)
    want = cv2.GaussianBlur(img, (ksize, ksize), sigma)
    got = np.round(np.asarray(image.gaussian_blur(jnp.asarray(img, dtype=jnp.float32), ksize, sigma, channel_dim=False)))
    assert np.abs(want.astype(float) - got).max() <= 1


def test_sharpen_matches_filter2d(rng):
    img = (rng.random((32, 40, 3)) * 255).astype(np.float32)
    k = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], np.float32)
    want = cv2.filter2D(img, -1, k)
    got = np.asarray(image.sharpen(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_upsample2x_align_corners_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((1, 4, 8, 10)).astype(np.float32)  # NCHW for torch
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=True).numpy()
    got = np.asarray(image.upsample2x_align_corners(jnp.asarray(x), h_axis=2, w_axis=3))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_align_corners_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.random((1, 3, 16, 20)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(37, 53), mode="bilinear", align_corners=True).numpy()
    got = np.asarray(image.resize_bilinear_align_corners(jnp.asarray(x), (37, 53), 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_letterbox_roundtrip(rng):
    img = (rng.random((45, 80, 3)) * 255).astype(np.uint8)
    boxed = np.asarray(image.letterbox(jnp.asarray(img), (64, 64)))
    assert boxed.shape == (64, 64, 3)
    mask = (rng.random((64, 64)) * 3).astype(np.int32)
    back = np.asarray(image.unletterbox_mask(jnp.asarray(mask), (45, 80), (64, 64)))
    assert back.shape == (45, 80)


def test_batched_resize(rng):
    imgs = (rng.random((4, 24, 32, 3)) * 255).astype(np.uint8)
    out = np.asarray(image.resize_bilinear(jnp.asarray(imgs), (48, 64)))
    assert out.shape == (4, 48, 64, 3)
    one = np.asarray(image.resize_bilinear(jnp.asarray(imgs[0]), (48, 64)))
    assert np.array_equal(out[0], one)
