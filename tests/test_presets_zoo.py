"""The last four script-zoo forks (VERDICT r2 missing #4): spatial,
roi_first, v3_high_quality, three_class_best — mechanism parity against the
reference scripts (direct import where the reference file is importable) and
end-to-end preset runs.

NB reference defect (SURVEY §2.5 spirit, not replicated):
/root/reference/infer_video_roi.py does not parse — softmax_np at :18-20 has
an unclosed paren — so roi_first parity is asserted against a test-local
numpy replication of its documented logic instead of a direct import.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference")


def _import_reference_spatial():
    """Import the reference's infer_video_spatial module (needs the
    torchvision stub trick from test_reference_parity)."""
    torch = pytest.importorskip("torch")
    for p in (str(REF), str(REF / "src")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "torchvision" not in sys.modules:
        import types

        import torch.nn as nn

        from tests.torch_ref import TBottleneck

        class _FakeResNet50(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.relu = nn.ReLU()
                self.maxpool = nn.MaxPool2d(3, 2, 1)

                def layer(cin, width, blocks, stride):
                    mods = [TBottleneck(cin, width, stride, project=True)]
                    mods += [TBottleneck(width * 4, width) for _ in range(blocks - 1)]
                    return nn.Sequential(*mods)

                self.layer1 = layer(64, 64, 3, 1)
                self.layer2 = layer(256, 128, 4, 2)
                self.layer3 = layer(512, 256, 6, 2)
                self.layer4 = layer(1024, 512, 3, 2)

        _tv = types.ModuleType("torchvision")
        _tv_models = types.ModuleType("torchvision.models")
        _tv_models.resnet50 = lambda *a, **kw: _FakeResNet50()
        _tv_models.ResNet50_Weights = types.SimpleNamespace(IMAGENET1K_V2=None)
        _tv.models = _tv_models
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.models"] = _tv_models
    import infer_video_spatial
    return infer_video_spatial


def _strip_scene(h=128, w=192, seed=0):
    """Mask with a tall thin keepable strip, a too-wide blob, a too-short
    blob, and a tiny speck."""
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), np.uint8)
    m[5:120, 60:95] = 1          # tall strip, w=35, h=115 (keep at 30..200)
    m[30:60, 100:180] = 1        # wide blob w=80 h=30 (too short: < 0.3*128?)
    m[0:6, 10:22] = 1            # small
    m[70:74, 8:12] = 1           # speck
    # random speckle
    m |= (r.random((h, w)) > 0.995).astype(np.uint8)
    return m


@pytest.mark.skipif(not REF.exists(), reason="reference mount absent")
def test_spatial_filter_parity_vs_reference():
    """spatial_strip_filter == the reference's own spatial_filter
    (reference infer_video_spatial.py:24-53) on the same mask, same gates."""
    ref = _import_reference_spatial()
    from unet_tpu.pipeline.config import PostprocessCfg
    from unet_tpu.pipeline.stages import spatial_strip_filter

    m = _strip_scene()
    want = ref.spatial_filter(m.copy(), min_width=30, max_width=200,
                              min_height_ratio=0.3).astype(bool)
    p = PostprocessCfg(enabled=True, mode="spatial")
    got = np.asarray(spatial_strip_filter(
        jnp.asarray(m[None].astype(bool)), p.spatial_cable_w, p))[0]
    assert want.any(), "fixture keeps nothing — tune it"
    assert np.array_equal(got, want)


@pytest.mark.skipif(not REF.exists(), reason="reference mount absent")
def test_relative_threshold_parity_vs_reference():
    """'relative' threshold mode vs the reference's relative_threshold
    (reference infer_video_spatial.py:71-98) given identical probabilities.

    Reference defect (not replicated): its overlap resolution indexes with a
    uint8 array (`cable[overlap]` at :88-94) — numpy treats that as integer
    row-indexing, not a boolean mask, so rows 0/1 of its output get scrambled
    whenever any overlap exists. Parity is therefore asserted on the base
    thresholds (identical), plus the documented intended semantics
    ('重叠区域取概率更高的' — overlap goes to the higher probability) for the
    overlap pixels."""
    ref = _import_reference_spatial()
    from unet_tpu.pipeline.config import PipelineCfg, SegmentCfg
    from unet_tpu.pipeline.stages import extract_masks

    r = np.random.default_rng(1)
    logits = r.normal(0, 2, (1, 32, 32, 3)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    base_c = probs[0, ..., 1] > probs[0, ..., 0] * 2.0
    base_t = probs[0, ..., 2] > probs[0, ..., 0] * 2.5
    overlap = base_c & base_t
    assert overlap.any(), "fixture has no overlap — the interesting case"

    got_c, got_t = extract_masks(jnp.asarray(logits), PipelineCfg(
        segment=SegmentCfg(threshold_mode="relative")))
    got_c, got_t = np.asarray(got_c)[0], np.asarray(got_t)[0]
    assert np.array_equal(got_c & ~overlap, base_c & ~overlap)
    assert np.array_equal(got_t & ~overlap, base_t & ~overlap)
    # away from its scrambled rows the reference agrees with the base gates
    want_c, want_t = ref.relative_threshold(probs[0].copy())
    assert np.array_equal(want_c.astype(bool)[2:] & ~overlap[2:],
                          (base_c & ~overlap)[2:])
    # intended overlap semantics: higher probability wins, masks exclusive
    wins = probs[0, ..., 1] >= probs[0, ..., 2]
    assert np.array_equal(got_c[overlap], wins[overlap])
    assert np.array_equal(got_t[overlap], ~wins[overlap])
    assert not (got_c & got_t).any()


def _ref_refine_numpy(mask, min_area=2000, aspect=2.0, wide_w=100,
                      edge_frac=0.1, edge_area=10000):
    """Numpy replication of refine_mask_by_geometry
    (reference infer_video_roi.py:128-167 — the file itself does not parse,
    see module docstring)."""
    import cv2
    n, labels, stats, cents = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=8)
    out = np.zeros_like(mask, np.uint8)
    H, W = mask.shape
    for i in range(1, n):
        area = stats[i, cv2.CC_STAT_AREA]
        w = stats[i, cv2.CC_STAT_WIDTH]
        h = stats[i, cv2.CC_STAT_HEIGHT]
        if area < min_area:
            continue
        if w > 0 and (h / w) < aspect and w > wide_w:
            continue
        cx = cents[i][0]
        if (cx < W * edge_frac or cx > W * (1 - edge_frac)) and area < edge_area:
            continue
        out[labels == i] = 1
    return out.astype(bool)


def test_refine_mask_parity():
    from unet_tpu.pipeline.config import PostprocessCfg
    from unet_tpu.pipeline.stages import refine_mask_by_geometry

    m = np.zeros((256, 512), np.uint8)
    m[10:250, 200:260] = 1    # big vertical strip -> keep
    m[20:60, 300:480] = 1     # wide squat blob (w=180 > 100, aspect<2) -> drop
    m[5:240, 10:40] = 1       # near left edge, area 7050 < 10000 -> drop
    m[100:140, 350:380] = 1   # merged with squat? no: rows 100:140 separate; area 1200 < 2000 -> drop
    want = _ref_refine_numpy(m)
    got = np.asarray(refine_mask_by_geometry(
        jnp.asarray(m[None].astype(bool)),
        PostprocessCfg(enabled=True, mode="refine")))[0]
    assert want.any() and not want.all()
    assert np.array_equal(got, want)


def test_ultra_strict_threshold_semantics():
    """'ultra_strict' implements the reference's adaptive + ultra-strict
    gates (infer_video_roi.py:60-126) as pure arithmetic: winner class AND
    adaptive abs threshold AND 2x-over-bg AND bg margin."""
    from unet_tpu.pipeline.config import PipelineCfg, SegmentCfg
    from unet_tpu.pipeline.stages import extract_masks

    r = np.random.default_rng(2)
    logits = r.normal(0, 3, (2, 24, 24, 3)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)

    # numpy replication of the documented reference logic
    def want_masks(p):
        mc, mt, mbg = p[..., 1].mean(), p[..., 2].mean(), p[..., 0].mean()
        t_c = min(0.85, mc + 0.4) if mc > 0.3 else 0.5
        t_t = min(0.85, mt + 0.5) if mt > 0.15 else 0.55
        marg = max(0.2, 1.0 - mbg)
        winner = p.argmax(-1)
        c = (winner == 1) & (p[..., 1] >= t_c) & (p[..., 1] > p[..., 0] * 2) \
            & (p[..., 1] >= p[..., 0] + marg)
        t = (winner == 2) & (p[..., 2] >= t_t) & (p[..., 2] > p[..., 0] * 2) \
            & (p[..., 2] >= p[..., 0] + marg)
        return c, t

    cfg = PipelineCfg(segment=SegmentCfg(threshold_mode="ultra_strict"))
    got_c, got_t = extract_masks(jnp.asarray(logits), cfg)
    for b in range(2):
        want_c, want_t = want_masks(probs[b])
        assert np.array_equal(np.asarray(got_c)[b], want_c)
        assert np.array_equal(np.asarray(got_t)[b], want_t)


@pytest.mark.slow
def test_detect_vertical_roi_and_crop_roundtrip():
    """Dynamic-ROI ops: the detected band covers the busy columns; the
    crop+paste roundtrip puts mask pixels back where they came from."""
    from unet_tpu.ops.image import (crop_resize_bilinear, detect_vertical_roi,
                                    uncrop_resize_nearest)

    rng = np.random.default_rng(3)
    h, w = 96, 256
    g = np.full((2, h, w), 50, np.float32)
    # busy texture in columns 90..150 -> dense canny edges there
    g[:, :, 90:150] = rng.uniform(0, 255, (2, h, 60))
    x0, x1 = detect_vertical_roi(jnp.asarray(g))
    x0, x1 = np.asarray(x0), np.asarray(x1)
    assert (x0 <= 90).all() and (x1 >= 150).all()
    assert (x0 >= 40).all() and (x1 <= 200).all()  # not the whole frame

    # blank frame -> central-half fallback (reference infer_video_roi.py:53-57)
    b0, b1 = detect_vertical_roi(jnp.zeros((1, h, w)))
    assert int(b0[0]) == w // 4 and int(b1[0]) == 3 * w // 4

    # crop-resize matches cv2.resize of the numpy crop
    import cv2
    img = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    a, b = 40, 168
    got = np.asarray(crop_resize_bilinear(
        jnp.asarray(img), jnp.asarray([a]), jnp.asarray([b]), (64, 64)))[0]
    want = cv2.resize(img[0, :, a:b], (64, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)

    # UPSCALED crop (narrow ROI -> wider model size): edge columns must
    # replicate the crop's own border like cv2, not blend pixels from
    # outside [a, b)
    a2, b2 = 100, 140
    got_up = np.asarray(crop_resize_bilinear(
        jnp.asarray(img), jnp.asarray([a2]), jnp.asarray([b2]), (64, 128)))[0]
    want_up = cv2.resize(img[0, :, a2:b2], (128, 64),
                         interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got_up, want_up, atol=1e-2, rtol=1e-4)

    # paste-back: a mask covering the whole model square lands exactly on
    # [a, b) and nowhere else
    full = jnp.ones((1, 64, 64), bool)
    back = np.asarray(uncrop_resize_nearest(full, jnp.asarray([a]),
                                            jnp.asarray([b]), (h, w)))[0]
    assert back[:, a:b].all() and not back[:, :a].any() and not back[:, b:].any()


class _MaskStub:
    """Fixed-mask logit stub (test_engine_inspect.StubModel shape)."""

    def __init__(self, mask, num_classes):
        self.mask = np.asarray(mask)
        self.num_classes = num_classes

    def apply(self, variables, x, train=False):
        import jax.nn
        onehot = jax.nn.one_hot(jnp.asarray(self.mask), self.num_classes) * 10.0
        return jnp.broadcast_to(onehot, (x.shape[0],) + onehot.shape)


def test_v3_preset_defect_map_end_to_end():
    """v3_high_quality: the 6-channel model's channel-3 blob must surface as
    class id 4 (loose) in the defect components — proving the (0,1,2,4,5,6)
    channel remap + threshold-based defect map
    (reference infer_video_v3_high_quality.py:33-36, predict())."""
    from unet_tpu.pipeline import get_preset, stages
    from unet_tpu.pipeline.config import InspectCfg

    cfg = get_preset("v3_high_quality")
    cfg = cfg.replace_in("preprocess", model_size=(64, 64))
    cfg = cfg.replace(inspect=InspectCfg(track_defects=True))
    mask = np.zeros((64, 64), np.int32)
    mask[:, 8:16] = 1
    mask[:, 28:60] = 2
    mask[20:36, 30:46] = 3   # channel 3 -> class id 4 (loose)
    model = _MaskStub(mask, 6)
    step = stages.build_step(model, cfg)
    frames = np.full((2, 128, 128, 3), 90, np.uint8)
    out = step({}, jnp.asarray(frames))
    comps = out.defect_components
    valid = np.asarray(comps.valid)
    cls = np.asarray(comps.class_id)
    assert valid.any(), "defect blob lost"
    assert set(cls[valid].tolist()) == {4}, f"remap broken: {cls[valid]}"
    # cable/tape still come through with the close3 cleanup applied
    assert np.asarray(out.cable_px).min() > 0
    assert np.asarray(out.tape_px).min() > 0


@pytest.mark.parametrize("name", ["spatial", "roi_first", "three_class_best"])
def test_zoo_presets_run_end_to_end(name):
    """Each remaining fork preset builds one jit step and produces sane
    outputs on a synthetic cable scene."""
    from tests.conftest import synthetic_cable_frame
    from unet_tpu.pipeline import get_preset, stages

    cfg = get_preset(name)
    cfg = cfg.replace_in("preprocess", model_size=(64, 64))
    if cfg.postprocess.enabled:
        # the reference gates are in 512-model-res pixels; scale areas by
        # (64/512)^2 and widths by 64/512 so the 64^2 test masks pass the
        # same relative gates
        cfg = cfg.replace_in("postprocess", spatial_min_area=15,
                             spatial_cable_w=(2, 25), spatial_tape_w=(2, 25),
                             refine_min_area=30, refine_edge_area=150,
                             refine_wide_w=12)
    mask = np.zeros((64, 64), np.int32)
    mask[:, 24:34] = 1
    mask[10:54, 20:38] = 2
    model = _MaskStub(mask, cfg.segment.num_classes)
    step = stages.build_step(model, cfg)
    frames = np.stack([synthetic_cable_frame(seed=i)[0] for i in range(2)])
    out = step({}, jnp.asarray(frames))
    assert np.asarray(out.class_map).shape == (2, 96, 128)
    assert out.diameters is not None
    # the stub's tape band is a solid vertical region inside every gate
    assert np.asarray(out.tape_px).min() > 0
