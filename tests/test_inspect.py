"""Window aggregation / decisions / detectors / gates (reference
src/infer/window_aggregator.py, src/refactor/event_detector.py,
infer_video_robust.py EventGate, infer_video_optimized.py DefectTracker)."""
import numpy as np
import pytest

from unet_tpu.inspect import (DefectTracker, EventConfig, EventDetector,
                              EventGate, FrameMetrics, FrameQualityGate,
                              FrameResult, ThresholdConfig, WindowAggregator,
                              make_decision, bbox_iou)


def _frame(i, dd=20.0, **kw):
    base = dict(timestamp_ns=i * 10 ** 9, frame_id=i, delta_d_mm=dd, dc_mm=10.0,
                dt_mm=10.0 + dd, cable_coverage=0.4, tape_coverage=0.35)
    base.update(kw)
    return FrameResult(**base)


def test_window_readiness():
    agg = WindowAggregator(window_duration_sec=3.0, min_frames=3, max_frames=5)
    agg.add_frame(_frame(0))
    agg.add_frame(_frame(1))
    assert not agg.is_ready()          # below min_frames
    agg.add_frame(_frame(2))
    assert not agg.is_ready()          # 2s span < 3s
    agg.add_frame(_frame(4))
    assert agg.is_ready()              # 4s span >= 3s
    agg.reset()
    assert agg.window_count == 1 and not agg.frames


def test_window_statistics():
    agg = WindowAggregator(min_frames=2, max_frames=4)
    dds = [18.0, 20.0, 22.0, 24.0]
    for i, dd in enumerate(dds):
        agg.add_frame(_frame(i, dd=dd, tape_num_components=i,
                             total_defect_area=100 * i))
    s = agg.get_statistics()
    assert s.num_frames == 4
    assert s.delta_d_mean == pytest.approx(np.mean(dds))
    assert s.delta_d_std == pytest.approx(np.std(dds))
    assert s.delta_d_p95 == pytest.approx(np.percentile(dds, 95))
    assert s.delta_d_range == pytest.approx(6.0)
    assert s.tape_components_max == 3
    assert s.frames_with_defects == 3
    assert s.total_defect_area == 600


@pytest.mark.parametrize("mutate,expect_reason,expect_sev", [
    (dict(delta_d_min=14.0), "thickness_insufficient", "P1"),
    (dict(delta_d_mean=13.0), "thickness_low_average", "P1"),
    (dict(delta_d_max=30.0), "bulge_detected", "P1"),
    (dict(delta_d_p95=27.0), "bulge_p95_exceeded", "P2"),
    (dict(delta_d_std=4.0), "wrap_uneven_std", "P2"),
    (dict(delta_d_range=12.0), "wrap_uneven_range", "P2"),
    (dict(tape_coverage_mean=0.1), "tape_low_coverage", "P1"),
    (dict(tape_hole_ratio_max=0.3), "tape_excessive_holes", "P1"),
    (dict(tape_components_max=9), "tape_fragmented", "P1"),
])
def test_decision_rules(mutate, expect_reason, expect_sev):
    from unet_tpu.inspect.window import WindowStatistics
    base = dict(window_id="w", start_time_ns=0, end_time_ns=3 * 10 ** 9,
                num_frames=6, delta_d_mean=20.0, delta_d_std=1.0,
                delta_d_max=22.0, delta_d_min=18.0, delta_d_p95=21.5,
                delta_d_range=4.0, dc_mean=10.0, dt_mean=30.0,
                cable_coverage_mean=0.4, tape_coverage_mean=0.4,
                tape_hole_ratio_max=0.02, total_defect_area=0,
                frames_with_defects=0, tape_components_avg=1.0,
                tape_components_max=1)
    ok = make_decision(WindowStatistics(**base))
    assert ok.result == "OK" and not ok.reasons
    base.update(mutate)
    ng = make_decision(WindowStatistics(**base))
    assert ng.result == "NG"
    assert any(expect_reason in r for r in ng.reasons)
    assert ng.severity == expect_sev


def test_decision_defect_rule():
    from unet_tpu.inspect.window import WindowStatistics
    stats = WindowStatistics(
        window_id="w", start_time_ns=0, end_time_ns=0, num_frames=6,
        delta_d_mean=20.0, delta_d_std=1.0, delta_d_max=22.0, delta_d_min=18.0,
        delta_d_p95=21.5, delta_d_range=4.0, dc_mean=10, dt_mean=30,
        cable_coverage_mean=0.4, tape_coverage_mean=0.4, tape_hole_ratio_max=0.0,
        total_defect_area=1000, frames_with_defects=4, tape_components_avg=1,
        tape_components_max=1)
    d = make_decision(stats)
    assert any("cable_defect_detected" in r for r in d.reasons)
    # frame ratio below threshold -> no trigger
    stats2 = stats.__class__(**{**stats.__dict__, "frames_with_defects": 2})
    assert make_decision(stats2).result == "OK"


def test_event_detector_consecutive_and_cooldown():
    cfg = EventConfig(ratio_min=1.05, ratio_max=1.5, thin_wrap_frames=2,
                      burr_frames=2, cooldown_frames=5)
    det = EventDetector(cfg)
    fm = lambda i, ratio=1.2, burr=False: FrameMetrics(i, 10, 12, 2, ratio, burr, .4, .3)
    assert det.add_frame(fm(0, ratio=1.0)) == []           # 1st thin frame
    assert det.add_frame(fm(1, ratio=1.0)) == ["thin_wrap"]  # 2nd -> trigger
    assert det.add_frame(fm(2, ratio=1.0)) == []           # counter restarts
    assert det.add_frame(fm(3, ratio=1.0)) == []           # cooldown blocks fire
    # counter persists through cooldown; first frame past cooldown fires
    assert det.add_frame(fm(7, ratio=1.0)) == ["thin_wrap"]
    # burr events
    det2 = EventDetector(cfg)
    det2.add_frame(fm(0, burr=True))
    assert det2.add_frame(fm(1, burr=True)) == ["burr"]
    # uniformity = std of ratios
    u = det2.compute_uniformity()
    assert u == pytest.approx(0.0)


def test_event_gate():
    # clock starting at 0 (video time): the first confirmed streak must fire
    # even though 0 - last_fire < cooldown would hold for last_fire = 0
    gate0 = EventGate(hold_frames=2, cooldown_sec=3.0, clock=lambda: 0.0)
    gate0.update(True)
    gate0.update(True)
    assert gate0.should_fire()

    t = [100.0]
    gate = EventGate(hold_frames=3, cooldown_sec=2.0, clock=lambda: t[0])
    for _ in range(2):
        gate.update(True)
    assert not gate.should_fire()
    gate.update(True)
    assert gate.should_fire()
    gate.update(True)
    assert not gate.should_fire()  # cooldown
    t[0] = 103.0
    assert gate.should_fire()
    gate.update(False)
    gate.update(True)
    gate.update(True)
    assert not gate.should_fire()  # broken streak


def test_defect_tracker():
    tr = DefectTracker(confirm_frames=3, iou_threshold=0.3)
    det = {"class_id": 3, "bbox": (10, 10, 30, 30), "area": 400}
    assert tr.update([det], 0) == []
    assert tr.update([det], 1) == []
    confirmed = tr.update([det], 2)
    assert len(confirmed) == 1
    assert confirmed[0]["duration"] == 3
    assert 0.5 < confirmed[0]["confidence"] <= 0.95
    # non-overlapping detection is a new track
    other = {"class_id": 3, "bbox": (200, 200, 220, 220), "area": 400}
    assert tr.update([other], 3) == []
    # stale pruning
    for i in range(4, 16):
        tr.update([], i)
    assert not tr.active


def test_bbox_iou():
    assert bbox_iou((0, 0, 10, 10), (0, 0, 10, 10)) == pytest.approx(1.0)
    assert bbox_iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
    assert bbox_iou((0, 0, 10, 10), (5, 0, 15, 10)) == pytest.approx(1 / 3)


def test_quality_gate_reasons():
    gate = FrameQualityGate()
    assert gate.check(100, 20, 1).reason == "ok"
    assert "glitch" in gate.check(100, 2, 1).reason
    assert "motion_blur" in gate.check(50, 20, 15).reason
    assert "too_flat" in gate.check(100, 5, 1).reason
    assert gate.check(100, 5, 1).is_bad
    assert not FrameQualityGate(enable=False).check(0, 0, 0).is_bad


def test_quality_stats_device(cable_scene):
    import cv2
    import jax.numpy as jnp

    from unet_tpu.inspect import quality_stats
    bgr, _ = cable_scene
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
    batch = np.stack([gray, gray * 0.5])
    lap_var, gray_std, mad = quality_stats(jnp.asarray(batch))
    want_lap = cv2.Laplacian(gray, cv2.CV_32F).var()  # cv2 5.0: f32 src needs f32 dst
    assert float(lap_var[0]) == pytest.approx(want_lap, rel=1e-3)
    assert float(gray_std[0]) == pytest.approx(gray.std(), rel=1e-4)
    assert float(mad[0]) == 0.0  # first frame vs itself
    assert float(mad[1]) == pytest.approx(np.abs(gray * 0.5 - gray).mean(), rel=1e-4)
