"""Pipeline stage unit tests: thresholds, postprocess, bbox limit, letterbox."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_tpu.pipeline import (PipelineCfg, PostprocessCfg, PreprocessCfg,
                               SegmentCfg, get_preset, stages)


def test_extract_masks_argmax():
    logits = np.zeros((1, 4, 4, 3), np.float32)
    logits[0, :, :2, 1] = 5.0   # cable left half
    logits[0, :, 2:, 2] = 5.0   # tape right half
    cfg = PipelineCfg()
    cable, tape = stages.extract_masks(jnp.asarray(logits), cfg)
    assert np.asarray(cable)[0, :, :2].all() and not np.asarray(cable)[0, :, 2:].any()
    assert np.asarray(tape)[0, :, 2:].all()


def test_extract_masks_per_class_priority():
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[..., 1] = 2.0  # cable prob high everywhere
    logits[0, 0, 0, 2] = 3.0  # tape wins at one pixel
    cfg = PipelineCfg(segment=SegmentCfg(
        threshold_mode="per_class", class_thresholds=(0.0, 0.3, 0.3)))
    cable, tape = stages.extract_masks(jnp.asarray(logits), cfg)
    assert bool(np.asarray(tape)[0, 0, 0])
    assert not bool(np.asarray(cable)[0, 0, 0])  # tape priority over cable


def test_extract_masks_exclusive():
    logits = np.zeros((1, 2, 2, 3), np.float32)
    # pixel (0,0): cable dominant; (0,1): bg dominant; (1,0): cable barely
    # above bg (within margin -> rejected)
    logits[0, 0, 0] = (0.0, 4.0, 0.0)
    logits[0, 0, 1] = (4.0, 0.0, 0.0)
    logits[0, 1, 0] = (1.0, 1.05, 0.0)
    cfg = PipelineCfg(segment=SegmentCfg(
        threshold_mode="exclusive", class_thresholds=(0.0, 0.5, 0.5),
        bg_margin=0.05, ct_margin=0.05))
    cable, tape = stages.extract_masks(jnp.asarray(logits), cfg)
    c = np.asarray(cable)
    assert c[0, 0, 0] and not c[0, 0, 1] and not c[0, 1, 0]


def test_cable_bbox_limit_matches_reference():
    cable = np.zeros((2, 40, 60), bool)
    cable[0, 10:20, 25:35] = True  # frame 0 has cable; frame 1 empty
    tape = np.ones((2, 40, 60), bool)
    got = np.asarray(stages.cable_bbox_limit(jnp.asarray(tape),
                                             jnp.asarray(cable), pad=5))
    want0 = np.zeros((40, 60), bool)
    want0[5:25, 20:40] = True  # bbox [10,19]x[25,34] padded by 5 (inclusive)
    assert np.array_equal(got[0], want0)
    assert not got[1].any()  # no cable -> all zero


def test_filter_cable_by_shape():
    import cv2
    m = np.zeros((64, 64), np.uint8)
    cv2.rectangle(m, (28, 5), (34, 58), 1, -1)   # tall centered cable
    cv2.circle(m, (8, 8), 5, 1, -1)              # round off-center blob
    cfg = PostprocessCfg(enabled=True, cable_min_area=50, cable_min_aspect=2.0,
                         cable_max_center_offset=0.35)
    got = np.asarray(stages.filter_cable_by_shape(jnp.asarray(m), cfg, 64))
    assert got[30, 31] and not got[8, 8]


def test_constrain_tape_to_ring():
    import cv2
    cable = np.zeros((64, 64), np.uint8)
    cv2.rectangle(cable, (28, 0), (35, 63), 1, -1)
    tape = np.ones((64, 64), np.uint8)
    cfg = PostprocessCfg(enabled=True, tape_ring_dilate=15, tape_ring_erode=5)
    got = np.asarray(stages.constrain_tape_to_ring(jnp.asarray(tape),
                                                   jnp.asarray(cable), cfg))
    # golden with cv2
    kd = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (15, 15))
    ke = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ring = cv2.dilate(cable, kd) & ~cv2.erode(cable, ke).astype(bool)
    n, lab, st, _ = cv2.connectedComponentsWithStats(
        (tape & ring).astype(np.uint8), connectivity=8)
    want = lab == (1 + np.argmax(st[1:, cv2.CC_STAT_AREA]))
    assert np.array_equal(got, want)


def test_letterbox_pipeline_runs():
    from unet_tpu.models import NestedUNet
    cfg = get_preset("robust").replace(
        preprocess=PreprocessCfg(model_size=(64, 64), letterbox=True))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    frames = (np.random.default_rng(0).random((2, 48, 96, 3)) * 255).astype(np.uint8)
    out = stages.build_step(model, cfg)(variables, jnp.asarray(frames))
    assert out.class_map.shape == (2, 48, 96)
    assert out.diameters is not None


def test_chunked_step_matches_per_batch(rng):
    """build_chunked_step: K batches in one dispatch, bit-equal to K
    separate per-batch dispatches."""
    import jax.numpy as jnp

    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg
    from unet_tpu.pipeline import stages

    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(64, 64)))
    frames = (rng.random((3, 2, 96, 128, 3)) * 255).astype(np.uint8)

    step = stages.build_step(model, cfg)
    chunked = stages.build_chunked_step(model, cfg)
    outs = chunked(variables, jnp.asarray(frames))
    assert outs.class_map.shape[:2] == (3, 2)
    for k in range(3):
        ref = step(variables, jnp.asarray(frames[k]))
        assert np.array_equal(np.asarray(outs.class_map[k]),
                              np.asarray(ref.class_map))
        assert np.array_equal(np.asarray(outs.cable_px[k]),
                              np.asarray(ref.cable_px))
