"""Geometric + filtering image ops with OpenCV-matching semantics, on device.

These replace the reference's per-frame host OpenCV preprocessing
(cv2.resize / cv2.rotate / cv2.GaussianBlur / sharpen filter2D, e.g.
reference infer_two_stage_burr.py:122-127, :275-280 and
infer_enhanced_burr.py:38-66) so the whole preprocess chain stays inside
one XLA program.

Conventions verified against OpenCV 5.0:
  * INTER_LINEAR uses half-pixel centers: src = (dst + 0.5) * scale - 0.5
  * INTER_NEAREST uses src = floor(dst * scale), clipped
  * default border for filters is BORDER_REFLECT_101 == np.pad(mode="reflect")

All functions accept leading batch dims; spatial axes are the trailing
(H, W) of masks/gray images or (H, W, C) of color images.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def _linear_index_weights(out_size: int, in_size: int):
    """Half-pixel-center source indices + lerp weights (cv2 INTER_LINEAR)."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    # border replicate: clamp indices; frac keeps its value but both taps
    # then read the same pixel which reproduces cv2's clamping.
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    i0 = np.clip(i0, 0, in_size - 1)
    return jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(frac)


def _resize_axis_linear(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, frac = _linear_index_weights(out_size, in_size)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    return a * (1.0 - frac) + b * frac


def resize_bilinear(img: jnp.ndarray, out_hw: Sequence[int], channel_dim: bool = None) -> jnp.ndarray:
    """cv2.resize(..., INTER_LINEAR) parity. `out_hw` = (H, W).

    `channel_dim`: True if the array has a trailing channel axis. If None it
    is inferred: trailing axis of size <= 4 is treated as channels.
    """
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    w_ax = h_ax + 1
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    x = _resize_axis_linear(x, int(out_hw[0]), h_ax)
    x = _resize_axis_linear(x, int(out_hw[1]), w_ax)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        return jnp.clip(jnp.round(x), info.min, info.max).astype(orig_dtype)
    return x.astype(orig_dtype)


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    scale = in_size / out_size
    idx = np.minimum(np.floor(np.arange(out_size) * scale), in_size - 1).astype(np.int64)
    return jnp.asarray(idx)


def resize_nearest(img: jnp.ndarray, out_hw: Sequence[int], channel_dim: bool = None) -> jnp.ndarray:
    """cv2.resize(..., INTER_NEAREST) parity (src = floor(dst * scale))."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    w_ax = h_ax + 1
    x = jnp.take(img, _nearest_indices(int(out_hw[0]), img.shape[h_ax]), axis=h_ax)
    x = jnp.take(x, _nearest_indices(int(out_hw[1]), img.shape[w_ax]), axis=w_ax)
    return x


def _upsample2x_matrix(n: int) -> np.ndarray:
    """(2n, n) align-corners x2 interpolation matrix: row j holds
    (1-frac, frac) at columns (i0, i1) for src = j*(n-1)/(2n-1). The x2
    align-corners pattern is aperiodic (the frac differs at every output
    row), so it is NOT expressible as a strided transposed conv — but as a
    constant bidiagonal matrix it rides the MXU instead of lowering to
    gathers (measured v5e: ~10% off the whole UNet++ 512^2 bf16 forward,
    33.8 -> 30.5 ms per batch of 8)."""
    out = 2 * n
    src = np.arange(out, dtype=np.float64) * (n - 1) / (out - 1)
    i0 = np.floor(src).astype(np.int64)
    frac = (src - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, n - 1)
    m = np.zeros((out, n), np.float32)
    np.add.at(m, (np.arange(out), i0), 1.0 - frac)
    np.add.at(m, (np.arange(out), i1), frac)
    return m


def upsample2x_align_corners(x: jnp.ndarray, h_axis: int, w_axis: int) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True).

    Used by the UNet decoder for weight/activation parity with the reference
    model (reference src/models/unetpp.py:76). align_corners maps
    src = i * (H_in - 1) / (H_out - 1). Implemented as two constant-matrix
    contractions (see _upsample2x_matrix); matrices are cast to x.dtype so
    bf16 runs keep the same weight rounding as an elementwise lerp, and
    HIGHEST precision keeps f32 runs exactly equal to torch (each output is
    one two-term lerp — zero entries contribute exact 0.0).
    """
    def axis_up(t, axis):
        n = t.shape[axis]
        if n == 1:
            return jnp.repeat(t, 2, axis=axis)
        m = jnp.asarray(_upsample2x_matrix(n)).astype(t.dtype)
        y = jnp.tensordot(m, t, axes=((1,), (axis,)),
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(y, 0, axis)

    return axis_up(axis_up(x, h_axis), w_axis)


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: Sequence[int], h_axis: int, w_axis: int) -> jnp.ndarray:
    """torch F.interpolate(..., mode='bilinear', align_corners=True) to an
    arbitrary size (deep-supervision heads, reference unetpp.py:123-131)."""
    def axis_rs(t, axis, out):
        n = t.shape[axis]
        if n == out:
            return t
        if out == 1 or n == 1:
            idx = np.zeros(out, dtype=np.int64)
            return jnp.take(t, jnp.asarray(idx), axis=axis)
        src = np.arange(out, dtype=np.float64) * (n - 1) / (out - 1)
        i0 = np.floor(src).astype(np.int64)
        frac = (src - i0).astype(np.float32)
        i1 = np.minimum(i0 + 1, n - 1)
        shape = [1] * t.ndim
        shape[axis] = out
        w = jnp.asarray(frac).reshape(shape).astype(t.dtype)
        return jnp.take(t, jnp.asarray(i0), axis=axis) * (1 - w) + jnp.take(t, jnp.asarray(i1), axis=axis) * w

    return axis_rs(axis_rs(x, h_axis, int(out_hw[0])), w_axis, int(out_hw[1]))


# ---------------------------------------------------------------------------
# rotation / letterbox
# ---------------------------------------------------------------------------

def rotate90_ccw(img: jnp.ndarray, channel_dim: bool = None) -> jnp.ndarray:
    """cv2.ROTATE_90_COUNTERCLOCKWISE (reference infer_two_stage_burr.py:276)."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    return jnp.flip(jnp.swapaxes(img, h_ax, h_ax + 1), axis=h_ax)


def rotate90_cw(img: jnp.ndarray, channel_dim: bool = None) -> jnp.ndarray:
    """cv2.ROTATE_90_CLOCKWISE."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    return jnp.flip(jnp.swapaxes(img, h_ax, h_ax + 1), axis=h_ax + 1)


def letterbox_params(src_hw: Sequence[int], dst_hw: Sequence[int]):
    """Aspect-preserving resize geometry (reference src/refactor/preprocess.py:147-172
    and infer_video_robust.py:40-61): returns (new_h, new_w, pad_top, pad_left)."""
    sh, sw = src_hw
    dh, dw = dst_hw
    scale = min(dh / sh, dw / sw)
    new_h, new_w = int(round(sh * scale)), int(round(sw * scale))
    pad_top = (dh - new_h) // 2
    pad_left = (dw - new_w) // 2
    return new_h, new_w, pad_top, pad_left


def letterbox(img: jnp.ndarray, dst_hw: Sequence[int], pad_value: float = 0.0,
              channel_dim: bool = None) -> jnp.ndarray:
    """Resize keeping aspect then center-pad to dst."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    sh, sw = img.shape[h_ax], img.shape[h_ax + 1]
    new_h, new_w, pt, pl = letterbox_params((sh, sw), dst_hw)
    x = resize_bilinear(img, (new_h, new_w), channel_dim)
    pad = [(0, 0)] * img.ndim
    pad[h_ax] = (pt, int(dst_hw[0]) - new_h - pt)
    pad[h_ax + 1] = (pl, int(dst_hw[1]) - new_w - pl)
    return jnp.pad(x, pad, constant_values=pad_value)


def unletterbox_mask(mask: jnp.ndarray, src_hw: Sequence[int], dst_hw: Sequence[int]) -> jnp.ndarray:
    """Inverse of `letterbox` for an (…, H, W) mask: crop the content region
    and nearest-resize back to the original frame size."""
    new_h, new_w, pt, pl = letterbox_params(src_hw, mask.shape[-2:])
    # crop content region (static slice)
    crop = mask[..., pt:pt + new_h, pl:pl + new_w]
    return resize_nearest(crop, src_hw, channel_dim=False)


# ---------------------------------------------------------------------------
# separable / small-kernel filters
# ---------------------------------------------------------------------------

def _pad_reflect101(x: jnp.ndarray, axis: int, before: int, after: int) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (before, after)
    return jnp.pad(x, pad, mode="reflect")


def filter1d(x: jnp.ndarray, kernel, axis: int) -> jnp.ndarray:
    """Correlate along one axis with BORDER_REFLECT_101. Kernel is a static
    1-D sequence; the loop unrolls into K shifted adds that XLA fuses."""
    k = np.asarray(kernel, dtype=np.float32)
    r_before = (len(k) - 1) // 2
    r_after = len(k) - 1 - r_before
    xp = _pad_reflect101(x.astype(jnp.float32), axis, r_before, r_after)
    n = x.shape[axis]
    out = None
    for i, w in enumerate(k):
        sl = jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
        term = sl * float(w)
        out = term if out is None else out + term
    return out


def sep_filter2d(img: jnp.ndarray, kx, ky, channel_dim: bool = None) -> jnp.ndarray:
    """Separable 2-D correlation (rows with ky, cols with kx), REFLECT_101."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    out = filter1d(img, ky, h_ax)
    out = filter1d(out, kx, h_ax + 1)
    return out


def filter2d(img: jnp.ndarray, kernel, channel_dim: bool = None) -> jnp.ndarray:
    """Small dense 2-D correlation with REFLECT_101 border (cv2.filter2D).
    Unrolls into kh*kw shifted adds — efficient for the 3x3/5x5 kernels the
    reference uses (sharpen kernel, infer_enhanced_burr.py:60-63)."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    k = np.asarray(kernel, dtype=np.float32)
    kh, kw = k.shape
    rt, rb = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    rl, rr = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    xp = _pad_reflect101(img.astype(jnp.float32), h_ax, rt, rb)
    xp = _pad_reflect101(xp, h_ax + 1, rl, rr)
    H, W = img.shape[h_ax], img.shape[h_ax + 1]
    out = None
    for i in range(kh):
        row = jax.lax.slice_in_dim(xp, i, i + H, axis=h_ax)
        for j in range(kw):
            if k[i, j] == 0.0:
                continue
            term = jax.lax.slice_in_dim(row, j, j + W, axis=h_ax + 1) * float(k[i, j])
            out = term if out is None else out + term
    if out is None:
        out = jnp.zeros_like(img, dtype=jnp.float32)
    return out


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity, including the fixed small-kernel table
    used when sigma <= 0 and the sigma-from-ksize formula."""
    small_tab = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0 and ksize in small_tab:
        return np.asarray(small_tab[ksize], dtype=np.float32)
    s = sigma if sigma > 0 else 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((x - c) ** 2) / (2 * s * s))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int | Sequence[int], sigma: float,
                  channel_dim: bool = None) -> jnp.ndarray:
    """cv2.GaussianBlur parity (separable, REFLECT_101). `ksize` may be an int
    or (kw, kh) like cv2; returns float32 (round yourself for uint8 parity)."""
    if isinstance(ksize, (tuple, list)):
        kw, kh = ksize
    else:
        kw = kh = ksize
    kx = gaussian_kernel1d(int(kw), sigma) if kw > 1 else np.asarray([1.0], np.float32)
    ky = gaussian_kernel1d(int(kh), sigma) if kh > 1 else np.asarray([1.0], np.float32)
    return sep_filter2d(img, kx, ky, channel_dim)


def sharpen(img: jnp.ndarray, channel_dim: bool = None) -> jnp.ndarray:
    """3x3 sharpen used by the enhanced preprocessing preset
    (reference infer_enhanced_burr.py:60-63)."""
    k = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], dtype=np.float32)
    return filter2d(img, k, channel_dim)


def smooth_profile_1d(x: jnp.ndarray, ksize: int = 31) -> jnp.ndarray:
    """Gaussian smoothing of a 1-D profile, matching
    reference src/utils/geometry.py:21-25 (cv2.GaussianBlur with sigma=0)."""
    if ksize <= 1:
        return x
    k = ksize if ksize % 2 == 1 else ksize + 1
    return filter1d(x, gaussian_kernel1d(k, 0.0), axis=x.ndim - 1)


def bilateral_filter(img: jnp.ndarray, d: int = 7, sigma_color: float = 25.0,
                     sigma_space: float = 5.0, channel_dim: bool = None) -> jnp.ndarray:
    """cv2.bilateralFilter semantics (REFLECT_101 border, color distance =
    L1 over channels) as an unrolled window sum — the reference's configurable
    substitute for non-local-means denoising
    (reference src/refactor/config.py:49-53, preprocess.py:60-66)."""
    if channel_dim is None:
        channel_dim = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if channel_dim else 2)
    r = d // 2
    x = img.astype(jnp.float32)
    xp = _pad_reflect101(_pad_reflect101(x, h_ax, r, r), h_ax + 1, r, r)
    H, W = img.shape[h_ax], img.shape[h_ax + 1]
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x[..., :1]) if channel_dim else jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy * dy + dx * dx > r * r:
                continue  # cv2 uses a circular window of radius d/2
            nb = jax.lax.slice_in_dim(xp, dy + r, dy + r + H, axis=h_ax)
            nb = jax.lax.slice_in_dim(nb, dx + r, dx + r + W, axis=h_ax + 1)
            if channel_dim:
                cdist = jnp.sum(jnp.abs(nb - x), axis=-1, keepdims=True)
            else:
                cdist = jnp.abs(nb - x)
            w = math.exp(gs * (dy * dy + dx * dx)) * jnp.exp(gc * cdist * cdist)
            num = num + w * nb
            den = den + w
    return num / den


# ---------------------------------------------------------------------------
# dynamic horizontal crop/resize (the ROI-first preset's core ops)
# ---------------------------------------------------------------------------

def crop_resize_bilinear(img: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray,
                         out_hw: Sequence[int]) -> jnp.ndarray:
    """Per-image DYNAMIC horizontal crop [x0, x1) resized to static `out_hw`
    with bilinear sampling (cv2 convention: src = (dst+0.5)*scale - 0.5).

    img (B, H, W, C) float, x0/x1 (B,) int — the crop box is a traced value,
    so the ROI-first preset (reference infer_video_roi.py:201-209 crops with
    numpy then cv2.resize's to 512) stays ONE static-shape jit program: the
    dynamic box becomes per-pixel gather coordinates instead of a dynamic
    slice, and batches with different boxes never recompile."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    H, W = img.shape[-3], img.shape[-2]

    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (H / oh) - 0.5
    y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)
    wy = jnp.clip(ys - y0i, 0.0, 1.0)

    def one(im, a, b):
        span = jnp.maximum((b - a).astype(jnp.float32), 1.0)
        xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (span / ow) - 0.5 + a
        # clamp sample columns to the CROP [a, b), not the image: cv2.resize
        # of a numpy crop replicates the crop's edge columns, and sampling
        # outside the box would blend out-of-ROI pixels in on upscales
        lo = jnp.clip(a, 0, W - 1)
        hi = jnp.clip(b - 1, lo, W - 1)
        x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), lo, hi)
        x1i = jnp.minimum(x0i + 1, hi)
        wx = jnp.clip(xs - x0i, 0.0, 1.0)[None, :, None]
        wyc = wy[:, None, None]
        top = im[y0i[:, None], x0i[None, :]] * (1 - wx) + im[y0i[:, None], x1i[None, :]] * wx
        bot = im[y1i[:, None], x0i[None, :]] * (1 - wx) + im[y1i[:, None], x1i[None, :]] * wx
        return top * (1 - wyc) + bot * wyc

    return jax.vmap(one)(img, x0, x1)


def uncrop_resize_nearest(mask: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray,
                          out_hw: Sequence[int]) -> jnp.ndarray:
    """Inverse of crop_resize_bilinear for bool masks: nearest-resize the
    model-res mask into the [x0, x1) horizontal span of a zeroed full frame
    (reference infer_video_roi.py:238-247 paste-back), per-image dynamic box,
    static shapes."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    mh, mw = mask.shape[-2], mask.shape[-1]
    ys = jnp.minimum((jnp.arange(oh) * mh) // oh, mh - 1)
    ox = jnp.arange(ow)

    def one(m, a, b):
        span = jnp.maximum(b - a, 1)
        xs = jnp.clip((ox - a) * mw // span, 0, mw - 1)
        out = m[ys[:, None], xs[None, :]]
        inside = jnp.logical_and(ox >= a, ox < b)
        return jnp.logical_and(out, inside[None, :])

    return jax.vmap(one)(mask, x0, x1)


def detect_vertical_roi(gray: jnp.ndarray, canny_low: float = 50.0,
                        canny_high: float = 150.0, smooth: int = 30,
                        rel_thresh: float = 0.3, margin_frac: float = 0.1):
    """Per-frame [x0, x1) bounds of the vertical edge-density band
    (reference detect_roi_by_projection, infer_video_roi.py:23-57): Canny ->
    per-column edge counts -> box smoothing -> columns above rel_thresh*max,
    expanded by margin_frac of the span; central half when nothing clears the
    threshold. (The reference rescales column indices by w/512 even though
    its projection ran at full width — a documented defect (SURVEY §2.5
    spirit) not replicated here.) Returns (x0, x1) int32 (B,) arrays."""
    from unet_tpu.ops import edges as _edges
    e = _edges.canny(gray, canny_low, canny_high)
    proj = jnp.sum(e.astype(jnp.float32), axis=-2)          # (B, W)
    k = jnp.ones((smooth,), jnp.float32) / smooth
    proj = jax.vmap(lambda p: jnp.convolve(p, k, mode="same"))(proj)
    thr = jnp.max(proj, axis=-1, keepdims=True) * rel_thresh
    active = proj > thr
    W = gray.shape[-1]
    any_active = jnp.any(active, axis=-1)
    x0 = jnp.argmax(active, axis=-1).astype(jnp.int32)
    x1 = (W - jnp.argmax(jnp.flip(active, -1), axis=-1)).astype(jnp.int32)
    m = ((x1 - x0).astype(jnp.float32) * margin_frac).astype(jnp.int32)
    x0 = jnp.maximum(x0 - m, 0)
    x1 = jnp.minimum(x1 + m, W)
    x0 = jnp.where(any_active, x0, W // 4)
    x1 = jnp.where(any_active, x1, (3 * W) // 4)
    return x0, x1
