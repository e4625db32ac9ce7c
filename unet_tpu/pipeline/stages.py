"""Fused device-side pipeline stages.

The reference runs stage 1 on GPU and everything else per-frame on host
OpenCV with a D<->H round-trip per frame (SURVEY §3.2). Here the entire
frame-batch pipeline — preprocess, UNet forward, mask extraction, ROI
limiting, burr detection, statistics, geometry — is one jit program built
from a PipelineCfg, so frames flow decode -> verdict with a single H->D
upload and one small D->H stats/class-map download per batch.

Stage semantics mirror, per cfg.name:
  two_stage   reference infer_two_stage_burr.py:50-119, :269-348
  enhanced    reference infer_enhanced_burr.py:38-138
  laplacian   reference src/refactor/burr_detector.py:11-66
  dog         reference src/refactor/burr_detector.py:69-118
  robust      reference infer_video_robust.py:70-216 (exclusive threshold,
              shape-scored cable CC, tape ring)
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_tpu.ops import cc as _cc
from unet_tpu.ops import clahe as _clahe
from unet_tpu.ops import color as _color
from unet_tpu.ops import edges as _edges
from unet_tpu.ops import frames as _frames_ops
from unet_tpu.ops import geometry as _geo
from unet_tpu.ops import image as _image
from unet_tpu.ops import morph as _morph
from unet_tpu.pipeline.config import BurrCfg, PipelineCfg, PostprocessCfg

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class QualityStats(NamedTuple):
    """Per-frame quality-gate statistics (reference infer_video.py:73-118).
    MAD is the within-batch frame diff; the first frame of each batch diffs
    against itself (mad=0 — one lenient motion check per batch, documented)."""
    lap_var: jnp.ndarray   # (B,) Laplacian variance (blur proxy)
    gray_std: jnp.ndarray  # (B,) gray std (flat/glitch proxy)
    mad: jnp.ndarray       # (B,) mean abs diff vs previous frame in batch


class DefectComponents(NamedTuple):
    """Fixed-size per-component defect table for the host DefectTracker
    (reference infer_video_optimized.py:66-189). Fields are (B, K)."""
    left: jnp.ndarray
    top: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    area: jnp.ndarray
    class_id: jnp.ndarray  # class at the component's root pixel
    valid: jnp.ndarray


class FrameOutputs(NamedTuple):
    """Per-frame results downloaded to host each batch (small)."""
    class_map: jnp.ndarray      # (B, H, W) uint8: 0 bg / 1 cable / 2 tape / 3 burr
    cable_px: jnp.ndarray       # (B,) int32
    tape_px: jnp.ndarray        # (B,) int32
    burr_px: jnp.ndarray        # (B,) int32
    diameters: Optional[_geo.DiameterMetrics]  # populated when geometry enabled
    defects: Optional[_geo.DefectAnalysis] = None       # geometry.analyze_defects
    defect_components: Optional[DefectComponents] = None  # inspect.track_defects
    quality: Optional[QualityStats] = None              # inspect.quality_stats


# ---------------------------------------------------------------------------
# preprocess
# ---------------------------------------------------------------------------

def geometric_preprocess(frames_bgr: jnp.ndarray, cfg: PipelineCfg) -> jnp.ndarray:
    """uint8 BGR (B, H, W, 3) -> float32 BGR at the pipeline working
    resolution (rotate / normalize only)."""
    if frames_bgr.ndim != 4 or frames_bgr.shape[-1] != 3:
        raise ValueError(
            f"expected (B, H, W, 3) BGR frames, got {frames_bgr.shape}")
    x = frames_bgr.astype(jnp.float32)
    if cfg.preprocess.rotate90_ccw:
        x = _image.rotate90_ccw(x)
    if cfg.preprocess.normalize_wh is not None:
        w, h = cfg.preprocess.normalize_wh
        x = _image.resize_bilinear(x, (h, w))
    return x


def preprocess_frames(frames_bgr: jnp.ndarray, cfg: PipelineCfg) -> jnp.ndarray:
    """uint8 BGR (B, H, W, 3) -> conditioned BGR float32 frame batch at the
    pipeline working resolution (rotate / normalize / enhance)."""
    x = geometric_preprocess(frames_bgr, cfg)
    if cfg.preprocess.enhance:
        x = enhance_frames(x, cfg)
    return x


def quality_stats(gray: jnp.ndarray,
                  prev_gray: Optional[jnp.ndarray] = None) -> QualityStats:
    """Device quality-gate statistics over a gray (B, H, W) batch
    (reference infer_video.py:84-118: Laplacian variance, gray std, MAD).
    Thin typed wrapper over inspect.detectors.quality_stats; pass the
    previous batch's last gray frame as `prev_gray` so frame 0's motion
    diff crosses the batch boundary instead of diffing against itself."""
    from unet_tpu.inspect.detectors import quality_stats as _qs
    return QualityStats(*_qs(gray, prev_gray))


def enhance_frames(bgr: jnp.ndarray, cfg: PipelineCfg) -> jnp.ndarray:
    """CLAHE(L) + denoise + sharpen enhancement preset
    (reference infer_enhanced_burr.py:38-66) on device.

    cfg.preprocess.denoise selects the denoiser: 'nlm' — the enhanced
    preset's default — is the reference's own
    fastNlMeansDenoisingColored(h=10, hColor=10, 7, 21) in device form
    (ops/frames.nlm_denoise_colored); the recorded fidelity measurement
    (docs/PERF.md §6, docs/experiments/measure_nlm_masks.py) shows it
    reproduces the reference's cv2 enhance chain at 28 dB PSNR / 0.989
    class-map agreement, while 'bilateral' — the reference's configurable
    refactor-pipeline alternative (src/refactor/config.py:51), cheaper
    (NLM is 441 shifted box-filter passes per channel) — lands at 15 dB /
    0.91 agreement with +65 % spurious burr px, i.e. NOT mask-equivalent;
    'none' skips denoising.
    """
    l, a, b = _color.bgr2lab(bgr)
    l = _clahe.clahe(jnp.clip(jnp.round(l), 0, 255),
                     cfg.preprocess.clahe_clip, cfg.preprocess.clahe_grid)
    out = _color.lab2bgr(l, a, b)
    if cfg.preprocess.denoise == "bilateral":
        out = _image.bilateral_filter(out, d=7, sigma_color=25.0, sigma_space=5.0)
    elif cfg.preprocess.denoise in ("nlm", "fastNlMeans"):
        out = _frames_ops.nlm_denoise_colored(out, h=10.0, h_color=10.0)
    out = jnp.clip(_image.sharpen(out), 0.0, 255.0)
    return out


def model_input(frames_bgr: jnp.ndarray, cfg: PipelineCfg,
                roi_bounds=None) -> jnp.ndarray:
    """BGR float frames -> normalized RGB tensor at model resolution
    (reference preprocess_image, infer_two_stage_burr.py:122-127; letterbox
    variant infer_video_robust.py:40-61). `roi_bounds` = per-frame (x0, x1)
    arrays from detect_vertical_roi: the model sees the dynamic horizontal
    crop (reference infer_video_roi.py:201-212)."""
    w, h = cfg.preprocess.model_size
    rgb = _color.bgr2rgb(frames_bgr)
    if roi_bounds is not None:
        x = _image.crop_resize_bilinear(rgb, roi_bounds[0], roi_bounds[1], (h, w))
    elif cfg.preprocess.letterbox:
        x = _image.letterbox(rgb, (h, w))
    else:
        x = _image.resize_bilinear(rgb, (h, w))
    if cfg.preprocess.normalization == "imagenet":
        return (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return x / 255.0


# ---------------------------------------------------------------------------
# segmentation mask extraction
# ---------------------------------------------------------------------------

def extract_masks(logits: jnp.ndarray, cfg: PipelineCfg):
    """logits (B, h, w, C) -> (cable, tape) bool masks at model resolution.

    threshold_mode:
      argmax     plain argmax (infer_two_stage_burr.py:299-300)
      per_class  per-class probability thresholds + priority merge
                 (infer_video_simple.py:82-154)
      exclusive  argmax among classes whose prob clears its threshold, with
                 bg/cable-tape margins (infer_video_robust.py:70-99)
    """
    seg = cfg.segment
    if seg.threshold_mode == "argmax":
        # softmax is monotonic — argmax over logits is identical
        pred = jnp.argmax(logits, axis=-1)
        return pred == seg.cable_cls, pred == seg.tape_cls
    probs = jax.nn.softmax(logits, axis=-1)

    if seg.threshold_mode == "per_class":
        th = np.asarray(seg.class_thresholds, np.float32)
        cable = probs[..., seg.cable_cls] >= th[seg.cable_cls]
        tape = probs[..., seg.tape_cls] >= th[seg.tape_cls]
        if seg.ct_ratio > 0:
            # mutual exclusion by probability ratio: cable only where
            # p_cable > p_tape * ratio and vice versa
            # (reference infer_video_v3_high_quality.py predict())
            p_c = probs[..., seg.cable_cls]
            p_t = probs[..., seg.tape_cls]
            return (jnp.logical_and(cable, p_c > p_t * seg.ct_ratio),
                    jnp.logical_and(tape, p_t > p_c * seg.ct_ratio))
        # priority: higher class id wins on overlap (defect>tape>cable merge,
        # reference infer_video.py:213-216)
        cable = jnp.logical_and(cable, jnp.logical_not(tape))
        return cable, tape

    if seg.threshold_mode == "relative":
        # relative-to-background thresholds, overlap -> higher prob wins
        # (reference infer_video_spatial.py:71-98 relative_threshold)
        p_bg = probs[..., 0]
        p_c = probs[..., seg.cable_cls]
        p_t = probs[..., seg.tape_cls]
        cable = p_c > p_bg * seg.bg_ratio_cable
        tape = p_t > p_bg * seg.bg_ratio_tape
        overlap = jnp.logical_and(cable, tape)
        cable_wins = p_c >= p_t
        cable = jnp.where(overlap, cable_wins, cable)
        tape = jnp.where(overlap, jnp.logical_not(cable_wins), tape)
        return cable, tape

    if seg.threshold_mode == "ultra_strict":
        # adaptive thresholds from whole-image prob statistics + the
        # ultra-strict gates: winner class + absolute threshold + 2x over bg
        # + bg margin (reference infer_video_roi.py:60-126
        # adaptive_thresholding + ultra_strict_threshold; the prints become
        # pure arithmetic — data-dependent ifs turn into jnp.where)
        p_bg = probs[..., 0]
        p_c = probs[..., seg.cable_cls]
        p_t = probs[..., seg.tape_cls]
        mean_c = jnp.mean(p_c, axis=(-2, -1), keepdims=True)
        mean_t = jnp.mean(p_t, axis=(-2, -1), keepdims=True)
        mean_bg = jnp.mean(p_bg, axis=(-2, -1), keepdims=True)
        t_cable = jnp.where(mean_c > 0.3, jnp.minimum(0.85, mean_c + 0.4), 0.5)
        t_tape = jnp.where(mean_t > 0.15, jnp.minimum(0.85, mean_t + 0.5), 0.55)
        bg_margin = jnp.maximum(0.2, 1.0 - mean_bg)
        winner = jnp.argmax(probs, axis=-1)
        cable = ((winner == seg.cable_cls) & (p_c >= t_cable)
                 & (p_c > p_bg * 2.0) & (p_c >= p_bg + bg_margin))
        tape = ((winner == seg.tape_cls) & (p_t >= t_tape)
                & (p_t > p_bg * 2.0) & (p_t >= p_bg + bg_margin))
        return cable, tape

    if seg.threshold_mode == "exclusive":
        th = np.asarray(seg.class_thresholds, np.float32)
        p_bg = probs[..., 0]
        p_c = probs[..., seg.cable_cls]
        p_t = probs[..., seg.tape_cls]
        c_ok = jnp.logical_and(p_c >= th[seg.cable_cls], p_c > p_bg + seg.bg_margin)
        t_ok = jnp.logical_and(p_t >= th[seg.tape_cls], p_t > p_bg + seg.bg_margin)
        cable = jnp.logical_and(c_ok, p_c > p_t + seg.ct_margin)
        tape = jnp.logical_and(t_ok, p_t >= p_c - seg.ct_margin)
        tape = jnp.logical_and(tape, jnp.logical_not(cable))
        return cable, tape

    raise ValueError(seg.threshold_mode)


def roi_limit(mask: jnp.ndarray, roi, frame_hw) -> jnp.ndarray:
    """Zero the mask outside the ROI (reference infer_two_stage_burr.py:310-314).
    Static box -> a multiplicative mask XLA folds into the producer."""
    if roi is None:
        return mask
    h, w = frame_hw
    r = roi.scaled((w, h)) if roi.space != (w, h) else roi
    sel = np.zeros((h, w), np.bool_)
    sel[max(r.y1, 0):min(r.y2, h), max(r.x1, 0):min(r.x2, w)] = True
    return jnp.logical_and(mask, jnp.asarray(sel))


# ---------------------------------------------------------------------------
# burr detection (stage 2)
# ---------------------------------------------------------------------------

def _cc_filter(cand: jnp.ndarray, b: BurrCfg) -> jnp.ndarray:
    """Connected-component area/aspect/size filter
    (reference infer_two_stage_burr.py:100-119) via the fused
    bbox-propagation fast path (no per-component tables, no top-K cap)."""
    return _cc.filter_components_by_geometry(
        cand, b.min_area, b.max_area, max_aspect=b.max_aspect,
        min_w=b.min_w, min_h=b.min_h, strict_min_wh=b.strict_min_wh)


def burr_canny_band(gray: jnp.ndarray, cable: jnp.ndarray, b: BurrCfg) -> jnp.ndarray:
    """Two-stage burr detector (reference detect_burrs_on_cable,
    infer_two_stage_burr.py:50-119): Canny edges inside the dilate-band."""
    band = _morph.outer_band(cable, _morph.ellipse_kernel(b.band_px))
    blurred = jnp.round(_image.gaussian_blur(gray, b.blur_ksize, b.blur_sigma,
                                             channel_dim=False))
    edges = _edges.canny(blurred, b.canny_low, b.canny_high)
    cand = jnp.logical_and(edges, band)
    cand = _morph.close_(cand, _morph.ellipse_kernel(b.close_ksize))
    cand = _morph.open_(cand, _morph.ellipse_kernel(b.open_ksize))
    return _cc_filter(cand, b)


def burr_multiscale(gray: jnp.ndarray, cable: jnp.ndarray, b: BurrCfg,
                    mag_max: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Enhanced multi-scale edge-fusion burr detector
    (reference detect_burrs_enhanced, infer_enhanced_burr.py:69-138):
    Canny | Sobel-magnitude | |Laplacian| inside a wide band. `mag_max`
    supplies the FULL-frame sobel-magnitude max when running on an ROI crop
    (the reference normalizes over the whole frame, :97)."""
    band = _morph.outer_band(cable, _morph.ellipse_kernel(b.band_px))
    blurred = jnp.round(_image.gaussian_blur(gray, b.blur_ksize, b.blur_sigma,
                                             channel_dim=False))
    e_canny = _edges.canny(blurred, b.canny_low, b.canny_high)
    mag = _edges.sobel_magnitude(gray)
    # per-image max normalization to uint8 (infer_enhanced_burr.py:97)
    maxmag = (jnp.max(mag, axis=(-2, -1), keepdims=True)
              if mag_max is None else mag_max[..., None, None])
    mag_u8 = jnp.floor(mag / jnp.maximum(maxmag, 1e-6) * 255.0)
    e_sobel = mag_u8 > b.sobel_thresh
    lap_u8 = _edges.uint8_wrap(jnp.abs(_edges.laplacian(gray)))
    e_lap = lap_u8 > b.laplacian_thresh
    cand = jnp.logical_and(jnp.logical_or(jnp.logical_or(e_canny, e_sobel), e_lap), band)
    cand = _morph.close_(cand, _morph.ellipse_kernel(b.close_ksize))
    cand = _morph.open_(cand, _morph.ellipse_kernel(b.open_ksize))
    return _cc_filter(cand, b)


def burr_laplacian(gray: jnp.ndarray, cable: jnp.ndarray, b: BurrCfg) -> jnp.ndarray:
    """Laplacian band threshold (reference src/refactor/burr_detector.py:11-66).
    band_px here is cfg.band_out; SE is (2*band_out+1) ellipse."""
    band = _morph.outer_band(cable, _morph.ellipse_kernel(2 * b.band_px + 1))
    lap_u8 = _edges.uint8_wrap(jnp.abs(_edges.laplacian(gray)))
    cand = jnp.logical_and(lap_u8 > b.laplacian_thresh, band)
    return _cc.filter_components_by_geometry(cand, b.min_area, b.max_area)


def burr_dog(gray: jnp.ndarray, cable: jnp.ndarray, b: BurrCfg) -> jnp.ndarray:
    """DoG alternative (reference src/refactor/burr_detector.py:69-118)."""
    band = _morph.outer_band(cable, _morph.ellipse_kernel(2 * b.band_px + 1))
    d = _edges.dog(gray)
    cand = jnp.logical_and(d > b.laplacian_thresh, band)
    return _cc.filter_components_by_geometry(cand, b.min_area, b.max_area)


_BURR_METHODS = {
    "canny_band": burr_canny_band,
    "multiscale": burr_multiscale,
    "laplacian": burr_laplacian,
    "dog": burr_dog,
    "none": None,
}


def _burr_on_roi_crop(gray: jnp.ndarray, cable: jnp.ndarray, cfg: PipelineCfg,
                      burr_fn, frame_hw, margin: int = 24) -> jnp.ndarray:
    """Run the burr stage on a static crop around the ROI and paste back.

    Burr candidates live within band_px (+morph kernels) of the ROI-limited
    cable mask, so cropping to ROI + band + margin is semantics-preserving
    except for edge-chain hysteresis paths that exit and re-enter the crop
    (negligible; margin keeps filter context intact)."""
    h, w = frame_hw
    r = cfg.roi.scaled((w, h)) if cfg.roi.space != (w, h) else cfg.roi
    pad = cfg.burr.band_px + max(cfg.burr.close_ksize, cfg.burr.open_ksize) + margin
    x1 = max(r.x1 - pad, 0)
    x2 = min(r.x2 + pad, w)
    y1 = max(r.y1 - pad, 0)
    y2 = min(r.y2 + pad, h)
    # keep lane dim a multiple of 128 when possible (TPU tiling)
    x2 = min(x1 + ((x2 - x1 + 127) // 128) * 128, w)
    kw = {}
    if burr_fn is burr_multiscale:
        # full-frame sobel max for the reference's global normalization
        kw["mag_max"] = jnp.max(_edges.sobel_magnitude(gray), axis=(-2, -1))
    burr_crop = burr_fn(gray[..., y1:y2, x1:x2], cable[..., y1:y2, x1:x2],
                        cfg.burr, **kw)
    out = jnp.zeros(gray.shape, jnp.bool_)
    return jax.lax.dynamic_update_slice(
        out, burr_crop, (0,) * (gray.ndim - 2) + (y1, x1))


# ---------------------------------------------------------------------------
# model-resolution CC postprocess (spatial / roi_first presets)
# ---------------------------------------------------------------------------

def spatial_strip_filter(mask: jnp.ndarray, w_bounds, p: PostprocessCfg) -> jnp.ndarray:
    """Vertical-strip component gates at model resolution: keep components
    with area > spatial_min_area, width within `w_bounds`, and height >=
    H * spatial_min_height_ratio (reference spatial_filter,
    infer_video_spatial.py:24-53; cable 30-200 px, tape 20-150 px)."""
    H = mask.shape[-2]
    labels = _cc.connected_components(mask)
    st = _cc.component_stats(labels, p.max_components)
    keep = ((st.area > p.spatial_min_area)
            & (st.width >= w_bounds[0]) & (st.width <= w_bounds[1])
            & (st.height >= H * p.spatial_min_height_ratio))
    return _cc.keep_mask(labels, st, keep)


def refine_mask_by_geometry(mask: jnp.ndarray, p: PostprocessCfg) -> jnp.ndarray:
    """Vertical-aspect + center-position component refinement at model
    resolution (reference refine_mask_by_geometry, infer_video_roi.py:128-167):
    drop area < refine_min_area; drop wide-and-squat components
    (h/w < refine_aspect while w > refine_wide_w); drop components whose
    centroid sits within refine_edge_frac of the left/right edge unless
    area >= refine_edge_area."""
    W = mask.shape[-1]
    labels = _cc.connected_components(mask)
    st = _cc.component_stats(labels, p.max_components)
    aspect = st.height.astype(jnp.float32) / jnp.maximum(
        st.width.astype(jnp.float32), 1.0)
    keep = st.area >= p.refine_min_area
    keep = jnp.logical_and(keep, jnp.logical_not(jnp.logical_and(
        aspect < p.refine_aspect, st.width > p.refine_wide_w)))
    near_edge = jnp.logical_or(st.cx < W * p.refine_edge_frac,
                               st.cx > W * (1.0 - p.refine_edge_frac))
    keep = jnp.logical_and(keep, jnp.logical_not(jnp.logical_and(
        near_edge, st.area < p.refine_edge_area)))
    return _cc.keep_mask(labels, st, keep)


def defect_map_from_thresholds(logits: jnp.ndarray, cable: jnp.ndarray,
                               tape: jnp.ndarray, cfg: PipelineCfg,
                               frame_hw) -> jnp.ndarray:
    """Full class map where defect classes come from per-channel probability
    thresholds + per-mask morphology + priority merge, NOT argmax
    (reference infer_video_v3_high_quality.py predict(): defect_thresh 0.70,
    open3/close5, merge order later-channel-wins over tape over cable).
    Channel k maps to class id class_remap[k] (the 6-class v3 model's
    channels are ids 0,1,2,4,5,6)."""
    seg = cfg.segment
    probs = jax.nn.softmax(logits, axis=-1)
    remap = seg.class_remap or tuple(range(seg.num_classes))
    out = jnp.zeros(cable.shape, jnp.uint8)
    out = jnp.where(cable, jnp.uint8(1), out)
    out = jnp.where(tape, jnp.uint8(2), out)
    for k in range(3, seg.num_classes):
        m = probs[..., k] >= seg.defect_threshold
        if seg.defect_open_ksize:
            m = _morph.open_(m, _morph.ellipse_kernel(seg.defect_open_ksize))
        if seg.defect_close_ksize:
            m = _morph.close_(m, _morph.ellipse_kernel(seg.defect_close_ksize))
        m = _image.resize_nearest(m, frame_hw, channel_dim=False)
        out = jnp.where(m, jnp.uint8(remap[k]), out)
    return out


# ---------------------------------------------------------------------------
# shape postprocess (robust preset)
# ---------------------------------------------------------------------------

def filter_cable_by_shape(cable: jnp.ndarray, p: PostprocessCfg, roi_width: int) -> jnp.ndarray:
    """Best-scoring cable component: score = area * aspect * (1 - offset)
    with area/aspect/center gates (reference src/refactor/postprocess.py:12-76)."""
    labels = _cc.connected_components(cable)
    stats = _cc.component_stats(labels, 16)
    aspect = (jnp.maximum(stats.width, stats.height)
              / (jnp.minimum(stats.width, stats.height) + 1e-6))
    offset = jnp.abs(stats.cx - roi_width / 2.0) / roi_width
    ok = (stats.valid & (stats.area >= p.cable_min_area)
          & (aspect >= p.cable_min_aspect) & (offset <= p.cable_max_center_offset))
    score = jnp.where(ok, stats.area * aspect * (1.0 - offset), -1.0)
    best = jnp.argmax(score, axis=-1)
    keep = jnp.logical_and(
        jax.nn.one_hot(best, score.shape[-1], dtype=bool),
        jnp.take_along_axis(score, best[..., None], axis=-1) > 0)
    return _cc.keep_mask(labels, stats, keep)


def cable_bbox_limit(mask: jnp.ndarray, cable: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Zero `mask` outside the cable bounding box + pad; all-zero when no
    cable (reference apply_roi_limit, infer_video_robust.py:201-216).
    Fixed-shape: per-frame bbox via argmax reductions + iota comparisons."""
    H, W = mask.shape[-2:]
    rows_any = jnp.any(cable, axis=-1)
    cols_any = jnp.any(cable, axis=-2)
    r0 = jnp.argmax(rows_any, axis=-1) - pad
    r1 = H - 1 - jnp.argmax(jnp.flip(rows_any, -1), axis=-1) + pad
    c0 = jnp.argmax(cols_any, axis=-1) - pad
    c1 = W - 1 - jnp.argmax(jnp.flip(cols_any, -1), axis=-1) + pad
    ri = jnp.arange(H)
    ci = jnp.arange(W)
    row_ok = jnp.logical_and(ri >= r0[..., None], ri <= r1[..., None])
    col_ok = jnp.logical_and(ci >= c0[..., None], ci <= c1[..., None])
    box = jnp.logical_and(row_ok[..., :, None], col_ok[..., None, :])
    has_cable = jnp.any(cable, axis=(-2, -1))[..., None, None]
    return jnp.logical_and(mask, jnp.logical_and(box, has_cable))


def constrain_tape_to_ring(tape: jnp.ndarray, cable: jnp.ndarray,
                           p: PostprocessCfg) -> jnp.ndarray:
    """Tape limited to the dilate-erode ring around cable, largest CC kept
    (reference src/refactor/postprocess.py:79-118)."""
    ring = jnp.logical_and(
        _morph.dilate(cable, _morph.ellipse_kernel(p.tape_ring_dilate)),
        jnp.logical_not(_morph.erode(cable, _morph.ellipse_kernel(p.tape_ring_erode))))
    constrained = jnp.logical_and(tape, ring)
    return _cc.largest_component(constrained)


# ---------------------------------------------------------------------------
# the fused step
# ---------------------------------------------------------------------------

def run_pipeline(variables: Dict[str, Any], frames_bgr: jnp.ndarray,
                 model: Any, cfg: PipelineCfg,
                 prev_frame_bgr: Optional[jnp.ndarray] = None) -> FrameOutputs:
    """Full fused pipeline over a frame batch. Jit with
    `jax.jit(run_pipeline, static_argnums=(2, 3))` or via build_step().
    `prev_frame_bgr` (1, H, W, 3): the previous batch's last frame, used
    only for the quality gate's cross-batch motion diff."""
    frames = geometric_preprocess(frames_bgr, cfg)
    B, H, W = frames.shape[0], frames.shape[1], frames.shape[2]

    quality = None
    if cfg.inspect.quality_stats:
        # on the un-enhanced frame, like the reference gate (infer_video.py:84)
        prev_gray = None
        if prev_frame_bgr is not None:
            prev_gray = _color.bgr2gray(
                geometric_preprocess(prev_frame_bgr, cfg))[0]
        quality = quality_stats(_color.bgr2gray(frames), prev_gray)

    if cfg.preprocess.enhance:
        frames = enhance_frames(frames, cfg)

    roi_bounds = None
    if cfg.preprocess.dynamic_roi:
        # ROI-first: per-frame vertical-projection bounds; dynamic values,
        # static shapes (reference infer_video_roi.py:23-57)
        pp = cfg.preprocess
        roi_bounds = _image.detect_vertical_roi(
            _color.bgr2gray(frames), smooth=pp.dynamic_roi_smooth,
            rel_thresh=pp.dynamic_roi_thresh,
            margin_frac=pp.dynamic_roi_margin)

    x = model_input(frames, cfg, roi_bounds)
    if cfg.segment.fast_forward or cfg.segment.int8_scales:
        from unet_tpu.models import NestedUNet
        from unet_tpu.models import fast_forward as _ff
        if not (isinstance(model, NestedUNet) and not model.pretrained_encoder):
            raise ValueError("segment.fast_forward/int8_scales require a "
                             "custom-encoder NestedUNet (models/fast_forward)")
        if cfg.segment.int8_scales:
            from unet_tpu.models import quantized as _q
            logits = _q.int8_apply(variables, x, cfg.segment.int8_scales,
                                   dtype=getattr(model, "dtype", jnp.bfloat16))
        else:
            logits = _ff.fast_apply(variables, x,
                                    dtype=getattr(model, "dtype", jnp.bfloat16))
    else:
        logits = model.apply(variables, x, train=False)
    if isinstance(logits, (list, tuple)):
        logits = logits[0]
    cable_m, tape_m = extract_masks(logits, cfg)

    # model-resolution component postprocess (the reference spatial/roi
    # scripts filter the small masks before paste-back)
    if cfg.postprocess.enabled and cfg.postprocess.mode == "spatial":
        cable_m = spatial_strip_filter(cable_m, cfg.postprocess.spatial_cable_w,
                                       cfg.postprocess)
        tape_m = spatial_strip_filter(tape_m, cfg.postprocess.spatial_tape_w,
                                      cfg.postprocess)
    elif cfg.postprocess.enabled and cfg.postprocess.mode == "refine":
        cable_m = refine_mask_by_geometry(cable_m, cfg.postprocess)
        tape_m = refine_mask_by_geometry(tape_m, cfg.postprocess)

    # masks back to frame resolution (infer_two_stage_burr.py:307-308; the
    # letterbox path crops the content region first, robust.py:52-61; the
    # dynamic-ROI path pastes into the per-frame crop span, roi.py:238-247)
    if roi_bounds is not None:
        cable = _image.uncrop_resize_nearest(cable_m, roi_bounds[0],
                                             roi_bounds[1], (H, W))
        tape = _image.uncrop_resize_nearest(tape_m, roi_bounds[0],
                                            roi_bounds[1], (H, W))
    elif cfg.preprocess.letterbox:
        cable = _image.unletterbox_mask(cable_m, (H, W),
                                        cable_m.shape[-2:])
        tape = _image.unletterbox_mask(tape_m, (H, W), tape_m.shape[-2:])
    else:
        cable = _image.resize_nearest(cable_m, (H, W), channel_dim=False)
        tape = _image.resize_nearest(tape_m, (H, W), channel_dim=False)

    if cfg.postprocess.close_ksize:
        # v3's "simple 3x3 close" on cable/tape (infer_video_v3_high_quality.py)
        se = _morph.ellipse_kernel(cfg.postprocess.close_ksize)
        cable = _morph.close_(cable, se)
        tape = _morph.close_(tape, se)

    if cfg.postprocess.enabled and cfg.postprocess.mode == "shape":
        roi_w = W if cfg.roi is None else (cfg.roi.scaled((W, H)).x2 - cfg.roi.scaled((W, H)).x1)
        cable = filter_cable_by_shape(cable, cfg.postprocess, roi_w)
        tape = constrain_tape_to_ring(tape, cable, cfg.postprocess)
        if cfg.postprocess.cable_bbox_pad > 0:
            tape = cable_bbox_limit(tape, cable, cfg.postprocess.cable_bbox_pad)
        if cfg.postprocess.morph_cleanup_ksize:
            se = _morph.ellipse_kernel(cfg.postprocess.morph_cleanup_ksize)
            cable = _morph.close_(_morph.open_(cable, se), se)
            tape = _morph.close_(_morph.open_(tape, se), se)

    cable = roi_limit(cable, cfg.roi, (H, W))
    tape = roi_limit(tape, cfg.roi, (H, W))

    burr_fn = _BURR_METHODS[cfg.burr.method]
    if burr_fn is not None:
        gray = _color.bgr2gray(frames)
        if cfg.roi is not None:
            # Stage 2 only looks at the band around ROI-limited cable, so run
            # it on a static ROI crop (+context margin) — ~4x fewer pixels on
            # the 800x448 path, which is where the CC/scan costs live.
            run = lambda g, c: _burr_on_roi_crop(g, c, cfg, burr_fn, (H, W))
        else:
            run = lambda g, c: burr_fn(g, c, cfg.burr)
        # the reference early-exits when no cable is present
        # (infer_two_stage_burr.py:69-70); lax.cond skips the whole edge/CC
        # stack on device for cable-free batches
        burr = jax.lax.cond(
            jnp.any(cable), run, lambda g, c: jnp.zeros_like(cable),
            gray, cable)
    else:
        burr = jnp.zeros_like(cable)

    class_map = jnp.zeros((B, H, W), jnp.uint8)
    class_map = jnp.where(cable, jnp.uint8(1), class_map)
    class_map = jnp.where(tape, jnp.uint8(2), class_map)
    class_map = jnp.where(burr, jnp.uint8(3), class_map)

    # full class map including defect classes (>=3) at frame resolution, for
    # defect analysis/tracking on multi-class models (the flagship 3-class
    # models have no defect classes — burr stands in as class 3)
    pred_full = None
    if cfg.segment.num_classes > 3 and (
            cfg.geometry.analyze_defects or cfg.inspect.track_defects):
        if cfg.segment.pred_full_from_thresholds:
            pred_full = defect_map_from_thresholds(logits, cable, tape, cfg,
                                                   (H, W))
        else:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            if cfg.segment.class_remap:
                pred = jnp.asarray(
                    np.asarray(cfg.segment.class_remap, np.uint8))[pred]
            pred_full = _image.resize_nearest(pred, (H, W), channel_dim=False)

    diameters = None
    if cfg.geometry.enabled:
        g = cfg.geometry
        mh, mw = cable_m.shape[-2:]
        if cfg.roi is None and not cfg.postprocess.enabled \
                and not cfg.preprocess.letterbox \
                and not cfg.preprocess.dynamic_roi \
                and not cfg.postprocess.close_ksize and H >= mh and W >= mw:
            # largest-CC denoise at MODEL resolution (partition-identical
            # under nearest UPscaling, min_area floor applied at frame scale)
            # — full-frame CC labeling dominated the wrap presets otherwise.
            # Downscaling can merge/drop components, so it falls through.
            cable_d = _geo.largest_component_lowres(cable_m, (H, W))
            tape_d = _geo.largest_component_lowres(tape_m, (H, W))
        else:
            cable_d = _cc.largest_component(cable, min_area=50)
            tape_d = _cc.largest_component(tape, min_area=50)
        diameters = _geo.diameter_metrics_from_masks(
            cable_d, tape_d, mm_per_px=g.mm_per_px,
            min_valid_rows=g.min_valid_rows, smooth_ksize=g.smooth_ksize)

    defects = None
    if cfg.geometry.analyze_defects:
        # analyze on cable=1/tape=2 from the final masks + model defect
        # classes where present (reference analyze_defects runs on pred_mask,
        # geometry_enhanced.py:246-330)
        analysis_map = jnp.zeros((B, H, W), jnp.uint8)
        analysis_map = jnp.where(cable, jnp.uint8(1), analysis_map)
        analysis_map = jnp.where(tape, jnp.uint8(2), analysis_map)
        if pred_full is not None:
            analysis_map = jnp.where(pred_full >= 3, pred_full, analysis_map)
        defects = _geo.analyze_defects(
            analysis_map, defect_classes=cfg.geometry.defect_classes,
            hole_min_size=cfg.geometry.hole_min_size,
            max_components=cfg.geometry.max_components)

    defect_components = None
    if cfg.inspect.track_defects:
        if pred_full is not None:
            defect_mask = pred_full >= 3
            class_src = pred_full
        else:
            defect_mask = burr
            class_src = jnp.where(burr, jnp.uint8(3), jnp.uint8(0))
        labels = _cc.connected_components(defect_mask)
        st = _cc.component_stats(labels, cfg.inspect.track_max_components)
        # class at the component's ROOT pixel — the root linear index is by
        # construction inside the component (unlike the centroid)
        cls = jnp.take_along_axis(class_src.reshape(B, H * W),
                                  st.label.astype(jnp.int32), axis=-1)
        defect_components = DefectComponents(
            left=st.left, top=st.top, width=st.width, height=st.height,
            area=st.area, class_id=jnp.where(st.valid, cls, 0), valid=st.valid)

    return FrameOutputs(
        class_map=class_map,
        cable_px=jnp.sum(cable, axis=(-2, -1), dtype=jnp.int32),
        tape_px=jnp.sum(tape, axis=(-2, -1), dtype=jnp.int32),
        burr_px=jnp.sum(burr, axis=(-2, -1), dtype=jnp.int32),
        diameters=diameters,
        defects=defects,
        defect_components=defect_components,
        quality=quality,
    )


def build_step(model: Any, cfg: PipelineCfg):
    """Returns jitted fn(variables, frames_u8_bgr) -> FrameOutputs."""
    return jax.jit(partial(run_pipeline, model=model, cfg=cfg))


def build_chunked_step(model: Any, cfg: PipelineCfg):
    """Offline/throughput variant: one dispatch processes K batches.

    Returns jitted fn(variables, frames (K, B, H, W, 3)) -> FrameOutputs
    with every leaf stacked to (K, ...). The K batches run as a lax.scan
    inside ONE device program, so host dispatch overhead is paid once per
    chunk instead of once per batch — the right shape for file/offline
    processing and for batched multi-stream serving, where latency of one
    batch doesn't matter but aggregate throughput does. (The real-time
    engine keeps per-batch dispatch + max_in_flight double buffering.)"""
    def run(variables, frame_chunks):
        def body(carry, fb):
            return carry, run_pipeline(variables, fb, model, cfg)
        _, outs = jax.lax.scan(body, 0, frame_chunks)
        return outs
    return jax.jit(run)


def calibrate_int8(model: Any, variables: Dict[str, Any], cfg: PipelineCfg,
                   frame_batches) -> PipelineCfg:
    """Post-training int8 calibration on representative frames: runs the
    pipeline's preprocessing + a float fast-forward observing activation
    ranges, and returns cfg with `segment.int8_scales` filled so build_step
    compiles the int8 path (models/quantized.py)."""
    from unet_tpu.models import quantized as _q

    pre = jax.jit(lambda f: model_input(
        enhance_frames(geometric_preprocess(f, cfg), cfg)
        if cfg.preprocess.enhance else geometric_preprocess(f, cfg), cfg))
    scales = _q.calibrate(variables,
                          (pre(jnp.asarray(b)) for b in frame_batches))
    return cfg.replace_in("segment", int8_scales=scales)


def validate_int8(model: Any, variables: Dict[str, Any], cfg: PipelineCfg,
                  qcfg: PipelineCfg, frames) -> float:
    """Class-map agreement between the float and int8 pipelines on held-out
    frames — the online proxy for the offline mIoU-delta gate
    (tests/test_quantized.py gates mIoU(int8) within 0.5 % of bf16 on labeled
    data; unlabeled video can only compare the two predictions). Callers
    should fall back to the float path below ~0.995 agreement."""
    frames = jnp.asarray(frames)
    ref = build_step(model, cfg)(variables, frames)
    out = build_step(model, qcfg)(variables, frames)
    return float((np.asarray(out.class_map)
                  == np.asarray(ref.class_map)).mean())
