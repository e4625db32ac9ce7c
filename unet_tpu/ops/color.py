"""Color-space conversions (device-side).

Replaces the reference's host cv2.cvtColor calls (e.g. BGR2RGB at
reference infer_two_stage_burr.py:123, BGR2GRAY at :317) with pure-JAX
elementwise ops that XLA fuses into the surrounding pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights, identical to OpenCV's RGB2GRAY constants.
_R_W, _G_W, _B_W = 0.299, 0.587, 0.114


def bgr2rgb(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR -> RGB (pure channel flip)."""
    return img[..., ::-1]


rgb2bgr = bgr2rgb


def rgb2gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB -> (..., H, W) luma, cv2.COLOR_RGB2GRAY semantics.

    For uint8 inputs OpenCV rounds to nearest; we compute in float32 and
    round iff the input is an integer type.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    gray = _R_W * r.astype(jnp.float32) + _G_W * g.astype(jnp.float32) + _B_W * b.astype(jnp.float32)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.round(gray).astype(img.dtype)
    return gray.astype(img.dtype)


def bgr2gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR -> luma (cv2.COLOR_BGR2GRAY)."""
    return rgb2gray(bgr2rgb(img))


def gamma_lut(img: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Gamma correction; mirrors the reference's LUT-based implementation
    (reference src/refactor/preprocess.py:52-57) as a direct power op.

    Accepts uint8 (returns uint8) or float in [0, 1] (returns float).
    """
    if jnp.issubdtype(img.dtype, jnp.integer):
        x = img.astype(jnp.float32) / 255.0
        y = jnp.power(x, 1.0 / gamma) * 255.0
        return jnp.clip(jnp.round(y), 0, 255).astype(img.dtype)
    return jnp.power(img, 1.0 / gamma).astype(img.dtype)


# ---------------------------------------------------------------------------
# CIELAB (cv2 8-bit conventions: L in [0,255], a/b offset by 128)
# ---------------------------------------------------------------------------

# sRGB (linear, no gamma — cv2's 8U path) -> XYZ, D65
_RGB2XYZ = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]], np.float32)
_XN, _ZN = 0.950456, 1.088754
_LAB_DELTA = 0.008856


def _lab_f(t):
    return jnp.where(t > _LAB_DELTA, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def _linear_to_srgb(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)


def bgr2lab(bgr):
    """cv2.COLOR_BGR2LAB parity for 8-bit inputs (float carriers); returns
    (L, a, b) planes so CLAHE can equalize L alone
    (reference infer_enhanced_burr.py:46-52). cv2 applies sRGB gamma
    linearization before the XYZ transform; its fixed-point tables give
    +-1 differences, tolerance-tested."""
    x = bgr.astype(jnp.float32) / 255.0
    x = _srgb_to_linear(x)
    r, g, b = x[..., 2], x[..., 1], x[..., 0]
    X = (_RGB2XYZ[0, 0] * r + _RGB2XYZ[0, 1] * g + _RGB2XYZ[0, 2] * b) / _XN
    Y = _RGB2XYZ[1, 0] * r + _RGB2XYZ[1, 1] * g + _RGB2XYZ[1, 2] * b
    Z = (_RGB2XYZ[2, 0] * r + _RGB2XYZ[2, 1] * g + _RGB2XYZ[2, 2] * b) / _ZN
    fy = _lab_f(Y)
    L = jnp.where(Y > _LAB_DELTA, 116.0 * jnp.cbrt(Y) - 16.0, 903.3 * Y)
    a = 500.0 * (_lab_f(X) - fy) + 128.0
    bb = 200.0 * (fy - _lab_f(Z)) + 128.0
    return L * (255.0 / 100.0), a, bb


def lab2bgr(L, a, b):
    """Inverse of bgr2lab (cv2.COLOR_LAB2BGR 8-bit), float BGR in [0, 255]."""
    Lp = L * (100.0 / 255.0)
    fy = (Lp + 16.0) / 116.0
    fx = fy + (a - 128.0) / 500.0
    fz = fy - (b - 128.0) / 200.0

    def finv(f):
        f3 = f * f * f
        return jnp.where(f3 > _LAB_DELTA, f3, (f - 16.0 / 116.0) / 7.787)

    Y = jnp.where(Lp > 903.3 * _LAB_DELTA, fy * fy * fy, Lp / 903.3)
    X = finv(fx) * _XN
    Z = finv(fz) * _ZN
    inv = np.linalg.inv(_RGB2XYZ).astype(np.float32)
    r = inv[0, 0] * X + inv[0, 1] * Y + inv[0, 2] * Z
    g = inv[1, 0] * X + inv[1, 1] * Y + inv[1, 2] * Z
    bl = inv[2, 0] * X + inv[2, 1] * Y + inv[2, 2] * Z
    out = _linear_to_srgb(jnp.stack([bl, g, r], axis=-1))
    return jnp.clip(out * 255.0, 0.0, 255.0)
