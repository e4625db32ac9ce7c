"""Config round-trip/migration + multi-stream serving tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pipeline_yaml_roundtrip(tmp_path):
    from unet_tpu.core.config import load_pipeline_yaml, save_pipeline_yaml
    from unet_tpu.pipeline import get_preset
    cfg = get_preset("enhanced")
    p = str(tmp_path / "cfg.yaml")
    save_pipeline_yaml(cfg, p)
    back = load_pipeline_yaml(p)
    assert back == cfg  # frozen dataclasses compare by value


def test_migrate_app_cfg(tmp_path):
    import yaml
    from unet_tpu.core.config import load_pipeline_yaml
    app = {
        "camera": {"type": "gige", "cti_path": "", "serial": "", "width": 800,
                   "height": 448, "pixel_format": "BayerRG8", "exposure_us": 100,
                   "gain_db": 1.0, "fps_limit": 25.0,
                   "roi": {"enabled": True, "x": 200, "y": 0, "w": 400, "h": 448}},
        "model": {"input_size": [512, 512], "num_classes": 3,
                  "encoder": "custom", "weights": "w.pth"},
        "scale": {"mm_per_px": 0.07, "cable_diameter_mm": 10.0},
        "thresholds": {"wrap_delta_max_mm": 8, "wrap_delta_min_mm": 2,
                       "bulge_mm": 4, "cv_wrap": 0.12, "defect_area_px": 800},
        "event": {"out_dir": "ev", "save_overlay": True,
                  "mqtt": {"enabled": False, "host": "", "port": 1883, "topic": "t"}},
        "device": {"use_gpu": True, "fp16": True},
    }
    p = tmp_path / "app.yaml"
    p.write_text(yaml.safe_dump(app))
    cfg = load_pipeline_yaml(str(p))
    assert cfg.segment.num_classes == 3
    assert cfg.geometry.mm_per_px == pytest.approx(0.07)
    assert cfg.roi is not None and (cfg.roi.x1, cfg.roi.x2) == (200, 600)


def test_migrate_refactor_cfg(tmp_path):
    import yaml
    from unet_tpu.core.config import load_pipeline_yaml
    ref = {
        "roi": {"mode": "fixed", "x": 100, "y": 0, "w": 400, "h": 480},
        "preprocess": {"enable_grayscale_enhance": True},
        "postprocess": {"cable_min_area": 1234, "tape_ring_dilate": 21},
        "event": {"ratio_min": 1.1},
        "burr": {"band_out": 12, "laplacian_threshold": 33, "min_area": 25,
                 "max_area": 444},
    }
    p = tmp_path / "refactor.yaml"
    p.write_text(yaml.safe_dump(ref))
    cfg = load_pipeline_yaml(str(p))
    assert cfg.burr.method == "laplacian"
    assert cfg.burr.band_px == 12 and cfg.burr.max_area == 444
    assert cfg.postprocess.enabled and cfg.postprocess.cable_min_area == 1234


def test_multistream_server():
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg
    from unet_tpu.serve import MultiStreamServer

    class FakeSource:
        def __init__(self, sid, n):
            self.sid, self.n = sid, n

        def frames(self):
            rng = np.random.default_rng(self.sid)
            for i in range(self.n):
                yield i + 1, (rng.random((48, 64, 3)) * 255).astype(np.uint8)

    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(32, 32)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    server = MultiStreamServer(model, variables, cfg)
    results = []
    summary = server.serve([FakeSource(0, 5), FakeSource(1, 3),
                            FakeSource(2, 4)], results.append)
    assert summary["frames"] == 12
    by_stream = {}
    for r in results:
        by_stream.setdefault(r.stream_id, []).append(r.frame_id)
    assert by_stream[0] == [1, 2, 3, 4, 5]
    assert by_stream[1] == [1, 2, 3]
    assert by_stream[2] == [1, 2, 3, 4]


def test_multistream_fixed_slots_single_compile():
    """Unequal stream lengths + a slow stream must not change the batch
    shape (one jit compile) and every frame is processed exactly once
    (VERDICT: fixed batch slots, non-blocking starvation policy)."""
    import time as _time

    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg
    from unet_tpu.serve import MultiStreamServer

    class FakeSource:
        def __init__(self, sid, n, delay=0.0):
            self.sid, self.n, self.delay = sid, n, delay

        def frames(self):
            rng = np.random.default_rng(self.sid)
            for i in range(self.n):
                if self.delay:
                    _time.sleep(self.delay)
                yield i + 1, (rng.random((48, 64, 3)) * 255).astype(np.uint8)

    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(32, 32)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    server = MultiStreamServer(model, variables, cfg,
                               starvation_timeout=0.005)
    shapes = []
    inner = server.step

    def counting_step(v, batch):
        shapes.append(tuple(batch.shape))
        return inner(v, batch)

    server.step = counting_step
    results = []
    summary = server.serve(
        [FakeSource(0, 7), FakeSource(1, 2), FakeSource(2, 5, delay=0.03)],
        results.append)
    assert summary["frames"] == 14
    # batch shape never changes -> the jitted step compiled exactly once
    assert set(shapes) == {(3, 48, 64, 3)}
    by_stream = {}
    for r in results:
        by_stream.setdefault(r.stream_id, []).append(r.frame_id)
    assert by_stream[0] == list(range(1, 8))
    assert by_stream[1] == [1, 2]
    assert by_stream[2] == list(range(1, 6))  # slow stream loses no frames


@pytest.mark.slow
def test_cli_serve_e2e(tmp_path):
    """VERDICT r2 item 4: `cli serve` drives MultiStreamServer end-to-end —
    3 unequal-length mixed-resolution streams, per-stream results.csv /
    events.jsonl / wrap_uniformity.csv, aggregate serve_summary.json."""
    import json

    import cv2

    from unet_tpu.cli.main import main as cli_main

    sizes = {"a": (5, (48, 64)), "b": (3, (64, 80)), "c": (4, (48, 64))}
    dirs = []
    rng = np.random.default_rng(0)
    for name, (n, (h, w)) in sizes.items():
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"f{i:03d}.png"), img)
        dirs.append(str(d))

    out = tmp_path / "out"
    rc = cli_main(["serve", "--videos", *dirs, "--output", str(out),
                   "--preset", "wrap_7class", "--model-size", "32"])
    assert rc == 0

    summary = json.loads((out / "serve_summary.json").read_text())
    assert summary["frames"] == 12
    assert [s["frames"] for s in summary["streams"]] == [5, 3, 4]
    for sid, name in enumerate(sizes):
        sdir = out / f"stream_{sid:02d}_{name}"
        rows = (sdir / "results.csv").read_text().strip().splitlines()
        assert rows[0].startswith("frame_id,cable_px,tape_px,burr_px,dc_px")
        n = sizes[name][0]
        assert len(rows) == 1 + n
        assert [int(r.split(",")[0]) for r in rows[1:]] == list(range(1, n + 1))
        # wrap preset has geometry enabled -> dc/dt populated + uniformity CSV
        assert rows[1].split(",")[4] != ""
        assert (sdir / "wrap_uniformity.csv").exists()
        assert (sdir / "events.jsonl").exists()
        assert json.loads((sdir / "summary.json").read_text())["frames"] == n

def test_cli_infer_with_refactor_config(tmp_path):
    """`cli infer --config refactor.yaml` (the reference's
    infer_video_refactored.py --config workflow): legacy RefactorConfig YAML
    selects the laplacian burr pipeline AND enables the EventDetector with
    the YAML's event section."""
    import cv2
    import yaml

    from unet_tpu.cli.main import main as cli_main

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(6):
        cv2.imwrite(str(d / f"f{i:03d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))

    ref = {
        "roi": {"mode": "fixed", "x": 8, "y": 0, "w": 48, "h": 64},
        "postprocess": {"cable_min_area": 10},
        "event": {"ratio_min": 1.1, "thick_wrap_frames": 2,
                  "cooldown_frames": 4},
        "burr": {"band_out": 6, "laplacian_threshold": 33, "min_area": 4,
                 "max_area": 444},
    }
    cfgp = tmp_path / "refactor.yaml"
    cfgp.write_text(yaml.safe_dump(ref))

    out = tmp_path / "out"
    rc = cli_main(["infer", "--video", str(d), "--output", str(out),
                   "--config", str(cfgp), "--model-size", "32",
                   "--batch", "3", "--no-video"])
    assert rc == 0
    rows = (out / "events.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 6
    # detector wired from the YAML event section
    assert (out / "detector_events.csv").exists()


def test_multistream_sink_failure_reaps_readers():
    """If the on_result sink raises mid-serve, serve() must re-raise AND
    terminate every reader thread — a reader wedged on its full frame queue
    would leak the thread and its open source in a long-lived server."""
    import threading

    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg
    from unet_tpu.serve import MultiStreamServer

    class EndlessSource:
        """Produces far more frames than the queue depth holds, so readers
        are guaranteed to be blocked on put() when the sink dies."""

        def __init__(self, sid):
            self.sid = sid

        def frames(self):
            rng = np.random.default_rng(self.sid)
            frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            for i in range(10_000):
                yield i + 1, frame

    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(32, 32)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    server = MultiStreamServer(model, variables, cfg, queue_depth=2,
                               max_in_flight=1)

    seen = {"n": 0}

    def sink(r):
        seen["n"] += 1
        if seen["n"] >= 3:
            raise RuntimeError("sink exploded")

    before = threading.active_count()
    with pytest.raises(RuntimeError, match="sink exploded"):
        server.serve([EndlessSource(0), EndlessSource(1)], sink)
    for t in server._threads:
        t.join(timeout=15.0)
    assert not any(t.is_alive() for t in server._threads), \
        "reader threads leaked after sink failure"
    assert threading.active_count() <= before + 1  # no stray accumulation

    # the server object stays usable after the failure (stop flag cleared)
    class Tiny:
        def frames(self):
            f = np.zeros((48, 64, 3), np.uint8)
            for i in range(2):
                yield i + 1, f

    summary = server.serve([Tiny(), Tiny()], lambda r: None)
    assert summary["frames"] == 4


def test_serve_normalizes_metaless_mixed_resolution_sources(tmp_path):
    """Camera-style sources publish no .meta (resolution unknown until
    acquisition) — the serve layer must still normalize a mixed-resolution
    group to one common shape instead of crashing np.stack on the first
    batch."""
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg
    from unet_tpu.serve.service import _CommonSize, _ResizedSource, serve_streams

    class CamLike:  # no .meta attribute, fixed own resolution
        def __init__(self, sid, hw, n=4):
            self.sid, self.hw, self.n = sid, hw, n

        def frames(self):
            rng = np.random.default_rng(self.sid)
            for i in range(self.n):
                yield i + 1, (rng.random(self.hw + (3,)) * 255).astype(np.uint8)

    common = _CommonSize(None)
    named = [("camA", _ResizedSource(CamLike(0, (48, 64)), common)),
             ("camB", _ResizedSource(CamLike(1, (96, 128)), common))]

    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(32, 32)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    summary = serve_streams(model, variables, cfg, named, str(tmp_path))
    assert summary["frames"] == 8
    assert {s["stream"] for s in summary["streams"]} == {"camA", "camB"}
    # whichever reader won the race, both streams were resized to ONE shape
    assert common._hw in ((48, 64), (96, 128))


def test_cli_int8_short_video_holds_out_agreement_frames(tmp_path, capsys):
    """`cli infer --int8` on a SHORT source (16 distinct frames, i.e. fewer
    than 2*n_calib strided frames): the calibration set and the agreement
    gate's frames must be disjoint (interleaved even/odd split). Before the
    split, the gate scored the exact frames it calibrated on and overstated
    int8 fidelity on short videos (VERDICT r3 item 8)."""
    import cv2

    from unet_tpu.cli.main import main as cli_main

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(7)
    for i in range(16):
        cv2.imwrite(str(d / f"f{i:03d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))

    out = tmp_path / "out"
    rc = cli_main(["infer", "--video", str(d), "--output", str(out),
                   "--preset", "two_stage", "--model-size", "32",
                   "--int8", "--batch", "4", "--no-video"])
    assert rc == 0
    text = capsys.readouterr().out
    # 16 distinct frames -> 8 calibrate (even indices), 8 held out (odd)
    assert "calibrated on 8 frames" in text
    assert "8 held out for the agreement gate" in text
    # the gate ran (either agreement >= 0.995, or the bf16 fallback fired)
    assert "agreement" in text
    rows = (out / "events.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 16


def test_cli_infer_config_keeps_preset_engine_hints(tmp_path):
    """A named preset saved to plain pipeline YAML and reloaded via
    `cli infer --config` must keep the preset's ENGINE behavior — the robust
    preset's event gate used to silently vanish on this path (hints were
    looked up by --preset only)."""
    import cv2

    from unet_tpu.cli.main import main as cli_main
    from unet_tpu.core.config import save_pipeline_yaml
    from unet_tpu.pipeline import get_preset

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        cv2.imwrite(str(d / f"f{i:03d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))

    cfg = get_preset("robust").replace_in("preprocess", model_size=(32, 32))
    cfgp = str(tmp_path / "robust.yaml")
    save_pipeline_yaml(cfg, cfgp)

    out = tmp_path / "out"
    rc = cli_main(["infer", "--video", str(d), "--output", str(out),
                   "--config", cfgp, "--batch", "2", "--no-video"])
    assert rc == 0
    # the robust preset's gate hint survived the YAML round trip: the gated
    # events CSV only exists when event_gate_enabled reached the engine
    assert (out / "gated_events.csv").exists()
