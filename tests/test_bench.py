"""Regression coverage for bench.py — the driver-run measurement artifact.

bench.py normally runs on the TPU; these tests drive its helpers on CPU at
tiny shapes to pin the sweep logic (mode selection, chunked-only threshold,
OOM-skip guard) without the device. The preset is shrunk to a 64x64 model
because 512^2 compiles for minutes on CPU.
"""
import numpy as np
import pytest

import bench
import unet_tpu.pipeline as pipeline_mod


@pytest.fixture()
def small_presets(monkeypatch):
    orig = pipeline_mod.get_preset

    def small(name, **kw):
        return orig(name, **kw).replace_in("preprocess", model_size=(64, 64))

    monkeypatch.setattr(pipeline_mod, "get_preset", small)


@pytest.mark.slow
def test_pipeline_bench_sweep(small_presets):
    fps, batch, med = bench._pipeline_bench(
        "two_stage", {}, batches=(2, 4), chunked_only_from=4,
        frame_hw=(64, 96))
    assert fps > 0 and med > 0
    assert batch in (2, 4)


@pytest.mark.slow
def test_pipeline_bench_skips_failing_batch(small_presets, monkeypatch):
    """A batch point whose measurement raises must be skipped, not fatal —
    the guard that keeps an OOM-ing large batch from killing the official
    run."""
    real = bench._throughput
    calls = []

    def throughput(step, variables, frames, batch, **kw):
        calls.append(batch)
        if batch >= 4:  # simulate the B>=160-style OOM at 800x448
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")
        return real(step, variables, frames, batch, **kw)

    monkeypatch.setattr(bench, "_throughput", throughput)
    fps, batch, med = bench._pipeline_bench(
        "two_stage", {}, batches=(2, 4), chunked_only_from=8,
        frame_hw=(64, 96))
    assert batch == 2 and fps > 0
    assert 4 in calls  # the failing point was attempted, then skipped


@pytest.mark.slow
def test_fixed_points_skips_failing_point(small_presets, monkeypatch):
    """The driver-default path (_fixed_points) must keep the OOM-skip guard:
    a point whose measurement raises is dropped, the rest still report."""
    real = bench._throughput
    calls = []

    def throughput(step, variables, frames, batch, **kw):
        calls.append(batch)
        if batch >= 8:  # the chunked point (chunk 4 x batch 2)
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")
        return real(step, variables, frames, batch, **kw)

    monkeypatch.setattr(bench, "_throughput", throughput)
    results = bench._fixed_points(
        "two_stage", {},
        [("chunked", 2, "bf16"), ("per_batch", 2, "bf16")],
        frame_hw=(64, 96))
    assert [r["mode"] for r in results] == ["per_batch"]
    assert 8 in calls  # the failing chunked point was attempted
    best, extra = bench._headline(results)
    assert best["mode"] == "per_batch" and best["fps"] > 0
    assert extra["realtime_per_batch_fps"] == round(best["fps"], 2)


@pytest.mark.slow
def test_fixed_points_soft_budget_skips_tail(small_presets, monkeypatch):
    """Once budget_s of wall clock is spent, remaining points are skipped —
    the guard that keeps a cold-cache compile pile-up from blowing the
    driver's timeout (BENCH_r03.json rc=124). The first point always runs."""
    calls = []
    real = bench._throughput

    def throughput(step, variables, frames, batch, **kw):
        calls.append(batch)
        return real(step, variables, frames, batch, **kw)

    monkeypatch.setattr(bench, "_throughput", throughput)
    results = bench._fixed_points(
        "two_stage", {},
        [("per_batch", 2, "bf16"), ("per_batch", 4, "bf16")],
        frame_hw=(64, 96), budget_s=0.0)  # budget already spent after pt 1
    assert [r["batch"] for r in results] == [2]
    assert calls == [2]
    assert bench._PARTIAL["results"] is results  # live for the SIGTERM path


def test_emit_partial_exits_zero_with_headline(monkeypatch):
    """The SIGTERM fallback prints a complete headline JSON from the points
    measured so far and exits 0 (rc=124 with no output records nothing)."""
    import json

    monkeypatch.setitem(bench._PARTIAL, "stem", "two_stage_800x448")
    monkeypatch.setitem(bench._PARTIAL, "results", [
        {"mode": "chunked", "batch": 96, "dtype": "int8",
         "fps": 388.2, "median": 387.5}])
    codes = []
    writes = []
    monkeypatch.setattr(bench.os, "_exit", lambda c: codes.append(c))
    # the handler emits via one os.write(1, ...) so a mid-print signal
    # cannot interleave; capture the payload instead of raw stdout
    monkeypatch.setattr(bench.os, "write", lambda fd, b: writes.append((fd, b)))
    bench._emit_partial_and_exit(15, None)
    assert codes == [0]
    assert len(writes) == 1 and writes[0][0] == 1
    out = json.loads(writes[0][1].decode().strip())
    assert out["value"] == 388.2 and "int8" in out["metric"]
    assert out["partial"].startswith("signal 15")
    # with nothing measured yet there is nothing honest to print: exit 124
    monkeypatch.setitem(bench._PARTIAL, "results", [])
    bench._emit_partial_and_exit(15, None)
    assert codes == [0, 124]


def test_headline_picks_best_and_reports_both_dtypes():
    results = [
        {"mode": "chunked", "batch": 96, "dtype": "int8",
         "fps": 388.2, "median": 387.5},
        {"mode": "chunked", "batch": 128, "dtype": "bf16",
         "fps": 338.0, "median": 335.1},
        {"mode": "per_batch", "batch": 32, "dtype": "int8",
         "fps": 262.2, "median": 260.0},
    ]
    best, extra = bench._headline(results)
    assert best["dtype"] == "int8" and best["batch"] == 96
    assert extra == {"bf16_fps": 338.0, "int8_fps": 388.2,
                     "realtime_per_batch_fps": 262.2}


def test_synthetic_frames_shape_and_content():
    frames = bench._synthetic_frames(np.random.default_rng(0), 3, h=64, w=96)
    assert frames.shape == (3, 64, 96, 3) and frames.dtype == np.uint8
    # cable strip must be brighter than the background noise floor
    assert frames[:, :, int(96 * 0.425) + 2].mean() > frames[:, :, 5].mean()
