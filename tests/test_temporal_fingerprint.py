"""Temporal-fingerprint e2e: the reference README publishes a per-phase
coverage pattern on its reference video (README.md:19-22 — bare-cable frames
show cable 42-47% / tape 0-4%, taped frames show tape rising while cable
drops — plus 0 burr false positives, README.md:16). This test reproduces
that behavioral contract end to end on synthetic footage: train a real
NestedUNet on labeled cable scenes, run the REAL engine loop (decode ->
fused device step -> stats -> events.csv) over a 3-phase video
(bare -> taped -> transition), and assert the measured per-frame coverage
matches ground truth and follows the phase pattern, with zero burr FPs.

Unlike the StubModel engine tests this exercises data->train->infer->stats
with a live model, so it is the rebuild's analogue of re-running the
reference video through infer_two_stage_burr.py:329-348 (whose cable/tape %
overlay is exactly the events.csv row written here)."""
import csv

import numpy as np
import pytest

import jax

from conftest import synthetic_cable_frame

pytestmark = pytest.mark.slow  # trains a real model + compiles the engine

CABLE_X = (26, 38)
# (tape_y, n_frames) per phase: bare -> taped -> transition
PHASES = [((0, 0), 8), ((12, 52), 8), ((40, 56), 8)]


@pytest.fixture(scope="module")
def trained_tape_model():
    """NestedUNet(3) trained on 64^2 scenes with varied tape spans,
    INCLUDING bare-cable frames, so tape presence is learned from content
    rather than a positional prior."""
    from unet_tpu.models import NestedUNet
    from unet_tpu.train import LossCfg, OptimCfg, create_train_state
    from unet_tpu.train.trainer import make_train_step

    spans = [(0, 0), (10, 30), (20, 44), (30, 54), (0, 64), (44, 60)]
    imgs, masks = zip(*[synthetic_cable_frame(h=64, w=64, cable_x=CABLE_X,
                                              tape_y=span, seed=7 * i + j)
                        for i, span in enumerate(spans) for j in range(2)])
    # engine preprocess feeds the model RGB (stages.py bgr2rgb, reference
    # infer_two_stage_burr.py:122-127) — train in the same channel order
    images = np.stack(imgs)[..., ::-1].astype(np.float32) / 255.0
    labels = np.stack(masks).astype(np.int32)

    model = NestedUNet(num_classes=3, deep_supervision=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3),
                               OptimCfg(lr=3e-3, schedule="constant",
                                        total_steps=150, clip_norm=10.0))
    step = jax.jit(make_train_step(LossCfg(kind="ce")))
    for _ in range(150):
        state, _ = step(state, images, labels)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    import jax.numpy as jnp
    pred = np.asarray(jnp.argmax(
        model.apply(variables, images, train=False), -1))
    acc = (pred == labels).mean()
    assert acc > 0.97, f"model failed to learn the scene (acc={acc:.3f})"
    return model, variables


@pytest.fixture(scope="module")
def phase_video(tmp_path_factory):
    """24-frame image-dir video in 3 phases + per-frame GT coverage (%)."""
    import cv2
    d = tmp_path_factory.mktemp("phase_video")
    gt = []
    fid = 0
    for span, n in PHASES:
        for j in range(n):
            bgr, mask = synthetic_cable_frame(h=64, w=64, cable_x=CABLE_X,
                                              tape_y=span, seed=1000 + fid)
            cv2.imwrite(str(d / f"f_{fid:03d}.png"), bgr)
            gt.append(((mask == 1).mean() * 100, (mask == 2).mean() * 100))
            fid += 1
            del j
    return str(d), gt


def test_phase_pattern_and_zero_burr_fp(trained_tape_model, phase_video,
                                        tmp_path):
    from unet_tpu.pipeline import (BurrCfg, EngineConfig, InferenceEngine,
                                   PipelineCfg, PreprocessCfg, SegmentCfg)

    model, variables = trained_tape_model
    video_dir, gt = phase_video
    cfg = PipelineCfg(
        name="fingerprint",
        preprocess=PreprocessCfg(model_size=(64, 64)),
        segment=SegmentCfg(num_classes=3),
        burr=BurrCfg(method="canny_band"),
    )
    eng = InferenceEngine(model, variables, cfg, EngineConfig(
        batch=8, output_dir=str(tmp_path), write_video=False,
        print_interval=100))
    summary = eng.process_video(video_dir)
    assert summary["processed"] == sum(n for _, n in PHASES)

    rows = list(csv.DictReader(open(tmp_path / "events.csv")))
    assert len(rows) == len(gt)
    cable = np.array([float(r["cable_pct"]) for r in rows])
    tape = np.array([float(r["tape_pct"]) for r in rows])

    # Quantitative: measured coverage tracks ground truth per frame.
    gt_cable = np.array([g[0] for g in gt])
    gt_tape = np.array([g[1] for g in gt])
    assert np.abs(cable - gt_cable).mean() < 3.0, (cable, gt_cable)
    assert np.abs(tape - gt_tape).mean() < 3.0, (tape, gt_tape)

    # Phase pattern (README.md:19-22 shape): bare phase has ~no tape and the
    # highest cable coverage; taped phase has the highest tape coverage and
    # depressed cable; transition sits between.
    a, b, c = slice(0, 8), slice(8, 16), slice(16, 24)
    assert tape[a].mean() < 1.5
    assert tape[b].mean() > tape[c].mean() > tape[a].mean()
    assert tape[b].mean() > 15.0
    assert cable[a].mean() > cable[b].mean()

    # Burr false positives: 0 frames on clean footage (README.md:16).
    assert summary["burr_frames"] == 0
    assert all(r["status"] == "[OK]" for r in rows)
