"""Frame-conditioning ops: grayscale detection/enhancement, NLM denoising,
aspect-preserving model resize (reference src/refactor/preprocess.py).

All device-side, batched over leading dims.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import clahe as _clahe
from unet_tpu.ops import color as _color
from unet_tpu.ops import image as _image


def is_grayscale_frame(frames_bgr: jnp.ndarray, threshold: float = 10.0) -> jnp.ndarray:
    """Per-frame grayscale detection via max mean channel difference
    (reference src/refactor/preprocess.py:12-32). (..., H, W, 3) -> (...,) bool."""
    x = frames_bgr.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    d1 = jnp.mean(jnp.abs(b - g), axis=(-2, -1))
    d2 = jnp.mean(jnp.abs(g - r), axis=(-2, -1))
    d3 = jnp.mean(jnp.abs(r - b), axis=(-2, -1))
    return jnp.maximum(jnp.maximum(d1, d2), d3) < threshold


def enhance_grayscale_frame(frames_bgr: jnp.ndarray, clahe_clip: float = 2.0,
                            clahe_tile: int = 8, gamma: float = 0.8,
                            denoise: str = "bilateral",
                            denoise_strength: int = 5) -> jnp.ndarray:
    """CLAHE + gamma LUT + denoise on the luma, back to 3-channel BGR
    (reference src/refactor/preprocess.py:35-74)."""
    gray = jnp.clip(jnp.round(_color.bgr2gray(frames_bgr.astype(jnp.float32))), 0, 255)
    out = _clahe.clahe(gray, clahe_clip, (clahe_tile, clahe_tile))
    if gamma != 1.0:
        out = _color.gamma_lut(out / 255.0, gamma) * 255.0
        out = jnp.clip(jnp.round(out), 0, 255)
    if denoise == "bilateral":
        out = _image.bilateral_filter(out, d=denoise_strength, sigma_color=75.0,
                                      sigma_space=75.0, channel_dim=False)
    elif denoise in ("fastNlMeans", "nlm"):
        out = nlm_denoise(out, h=float(denoise_strength))
    return jnp.repeat(out[..., None], 3, axis=-1)


def conditional_grayscale_enhance(frames_bgr: jnp.ndarray, threshold: float = 10.0,
                                  **enhance_kw) -> jnp.ndarray:
    """preprocess_frame parity (reference preprocess.py:77-92): enhance only
    frames detected as grayscale — per-frame select, fixed shapes."""
    is_gray = is_grayscale_frame(frames_bgr, threshold)
    enhanced = enhance_grayscale_frame(frames_bgr, **enhance_kw)
    sel = is_gray.reshape(is_gray.shape + (1, 1, 1))
    return jnp.where(sel, enhanced, frames_bgr.astype(jnp.float32))


def nlm_denoise(gray: jnp.ndarray, h: float = 10.0, template: int = 7,
                search: int = 21) -> jnp.ndarray:
    """Non-local-means denoising of (..., H, W) luma on device.

    The TPU-shaped formulation of cv2.fastNlMeansDenoising
    (reference infer_enhanced_burr.py:57, src/refactor/preprocess.py:68):
    for every offset in the search window, the patch distance field is one
    box filter of the squared shifted difference — (search²-1) fused
    conv+elementwise passes, no gather. Weight w = exp(-max(d² - 2σ², 0)/h²)
    with σ estimated as 0 (cv2 default). Quality-tested (PSNR), not bit-exact
    (cv2 uses integer LUT approximations internally).
    """
    r = search // 2
    # reflect-pad (BORDER_REFLECT_101, cv2's default) by the search+template
    # radius so border patch candidates come from reflected content, not the
    # opposite image edge (jnp.roll wraps — with search=21 the affected band
    # was 10 px wide)
    pad = r + template // 2
    x0 = gray.astype(jnp.float32)
    h_ax, w_ax = x0.ndim - 2, x0.ndim - 1
    widths = [(0, 0)] * (x0.ndim - 2) + [(pad, pad), (pad, pad)]
    x = jnp.pad(x0, widths, mode="reflect")

    # TPU: single-launch VMEM-resident kernel (ops/nlm_pallas.py) — the XLA
    # scan below round-trips ~8 full-res arrays through HBM per offset,
    # which measured 10.5 FPS end-to-end on the enhanced preset vs the
    # kernel's VPU-bound loop. Same padded-array semantics; parity asserted
    # in tests/test_nlm_pallas.py. UNET_TPU_NLM_PALLAS=0 opts out.
    import os
    from unet_tpu.ops import nlm_pallas as _np_
    hp, wp = x.shape[-2], x.shape[-1]
    if (jax.default_backend() == "tpu" and _np_.supported(hp, wp)
            and os.environ.get("UNET_TPU_NLM_PALLAS", "1") != "0"):
        lead = x.shape[:-2]
        flat = x.reshape((-1, hp, wp))
        out = _np_.nlm_padded(flat, h, template, search)
        out = out.reshape(lead + (hp, wp))
        return out[tuple([slice(None)] * (x0.ndim - 2)
                         + [slice(pad, -pad), slice(pad, -pad)])]

    area = float(template * template)
    box = np.ones(template, np.float32)

    inv_h2 = 1.0 / (h * h)
    # all non-center offsets, scanned (one traced body instead of search²-1
    # unrolled passes — the unrolled form compiled for minutes at search=21)
    offs = np.array([(dy, dx)
                     for dy in range(-r, r + 1) for dx in range(-r, r + 1)
                     if (dy, dx) != (0, 0)], np.int32)

    def body(carry, off):
        num, den = carry
        shifted = jnp.roll(x, (off[0], off[1]), axis=(h_ax, w_ax))
        d2 = (x - shifted) ** 2
        # mean squared patch distance via separable box filter
        d2 = _image.filter1d(d2, box, h_ax)
        d2 = _image.filter1d(d2, box, w_ax) / area
        w = jnp.exp(-d2 * inv_h2)
        return (num + w * shifted, den + w), None

    (num, den), _ = jax.lax.scan(
        body, (jnp.zeros_like(x), jnp.zeros_like(x)), jnp.asarray(offs))
    # center pixel weight = max weight convention (cv2-style)
    num = num + x
    den = den + 1.0
    out = num / den
    return out[tuple([slice(None)] * (x0.ndim - 2)
                     + [slice(pad, -pad), slice(pad, -pad)])]


def nlm_denoise_colored(bgr: jnp.ndarray, h: float = 10.0, h_color: float = 10.0,
                        template: int = 7, search: int = 21) -> jnp.ndarray:
    """cv2.fastNlMeansDenoisingColored-shaped: denoise L with `h` and a/b
    chroma with `h_color` in CIELAB, convert back
    (reference infer_enhanced_burr.py:57)."""
    L, a, b = _color.bgr2lab(bgr)
    L = nlm_denoise(L, h, template, search)
    a = nlm_denoise(a, h_color, template, search)
    b = nlm_denoise(b, h_color, template, search)
    return _color.lab2bgr(L, a, b)


def resize_for_model(frames: jnp.ndarray, target_size: int = 512
                     ) -> Tuple[jnp.ndarray, float]:
    """Aspect-preserving resize + top-left zero pad to a square
    (reference src/refactor/preprocess.py:147-172). Static shapes: scale is
    a Python float derived from the static input shape."""
    h, w = frames.shape[-3], frames.shape[-2]
    scale = target_size / max(h, w)
    nh, nw = int(h * scale), int(w * scale)
    x = _image.resize_bilinear(frames, (nh, nw))
    pad = [(0, 0)] * frames.ndim
    pad[-3] = (0, target_size - nh)
    pad[-2] = (0, target_size - nw)
    return jnp.pad(x, pad), scale


def resize_mask_back(mask: jnp.ndarray, original_hw: Sequence[int],
                     scale: float) -> jnp.ndarray:
    """Inverse of resize_for_model for (..., S, S) masks
    (reference preprocess.py:175-197)."""
    h, w = original_hw
    sh, sw = int(h * scale), int(w * scale)
    cropped = mask[..., :sh, :sw]
    return _image.resize_nearest(cropped, (h, w), channel_dim=False)
