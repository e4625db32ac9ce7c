"""Event emitters + data layer tests (reference src/events/*, src/utils/logger.py,
src/data/*)."""
import json
import os

import numpy as np
import pytest

from unet_tpu.events import (AnomalyLogger, EventManager, EventOutputConfig,
                             InspectionEventLogger, JSONLogger,
                             StatisticsLogger, format_reasons_readable)
from unet_tpu.inspect import make_decision
from unet_tpu.inspect.window import WindowStatistics


def _stats(**kw):
    base = dict(window_id="win_000001_0", start_time_ns=0, end_time_ns=3 * 10 ** 9,
                num_frames=6, delta_d_mean=20.0, delta_d_std=1.0, delta_d_max=22.0,
                delta_d_min=10.0, delta_d_p95=21.5, delta_d_range=4.0, dc_mean=10.0,
                dt_mean=30.0, cable_coverage_mean=0.4, tape_coverage_mean=0.4,
                tape_hole_ratio_max=0.02, total_defect_area=0, frames_with_defects=0,
                tape_components_avg=1.0, tape_components_max=1)
    base.update(kw)
    return WindowStatistics(**base)


def test_inspection_event_logger(tmp_path):
    log = InspectionEventLogger(EventOutputConfig(output_dir=str(tmp_path)))
    frame = np.zeros((32, 32, 3), np.uint8)
    ng = make_decision(_stats())                    # delta_d_min=10 -> NG P1
    ok = make_decision(_stats(delta_d_min=18.0))
    rec = log.log_event(ng, _stats(), frame_bgr=frame, overlay_bgr=frame)
    log.log_event(ok, _stats(delta_d_min=18.0), frame_bgr=frame)
    assert os.path.exists(rec["images"]["raw_image"])
    assert "ng/raw" in rec["images"]["raw_image"].replace("\\", "/")
    lines = [json.loads(l) for l in open(tmp_path / "inspection_events.jsonl")]
    assert len(lines) == 2
    assert {l["result"] for l in lines} == {"OK", "NG"}
    s = log.get_summary()
    assert s["total_events"] == 2 and s["ng_count"] == 1 and s["p1_count"] == 1
    assert s["ng_rate"] == 50.0


def test_event_manager(tmp_path):
    em = EventManager(str(tmp_path))
    frame = np.zeros((16, 16, 3), np.uint8)
    payload = em.emit("cam0", frame, frame, [{"code": "burr", "severity": "P2",
                                              "detail": "x"}],
                      {"m": 1}, timestamp_ns=123)
    assert payload["camera_id"] == "cam0"
    assert os.path.exists(payload["image"]) and os.path.exists(payload["overlay"])
    jsons = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert len(jsons) == 1


def test_loggers(tmp_path):
    al = AnomalyLogger(str(tmp_path / "events.log"))
    al.log_event("t0", "burr", (1, 2, 3, 4), 55)
    al.log_event("t1", "loose", (5, 6, 7, 8))
    events = al.read_log()
    assert events[0]["bbox"] == (1, 2, 3, 4) and events[0]["area_pixels"] == 55
    assert events[1]["area_pixels"] is None

    jl = JSONLogger(str(tmp_path / "jevents"))
    p = jl.save_event("cam0", 42, [{"code": "x", "severity": "P1", "detail": ""}])
    assert json.loads(open(p).read())["timestamp_ns"] == 42

    sl = StatisticsLogger(str(tmp_path / "stats.csv"))
    sl.log_statistics(100, 7, 12.5)
    assert len(open(tmp_path / "stats.csv").readlines()) == 2


def test_format_reasons():
    assert format_reasons_readable([]) == "Normal"
    out = format_reasons_readable(["thickness_insufficient: x", "weird_reason"])
    assert "厚度不足" in out and "weird_reason" in out


# ---------------------------------------------------------------------------
# data layer
# ---------------------------------------------------------------------------

@pytest.fixture
def seg_folder(tmp_path, rng):
    import cv2
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(6):
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        mask = np.zeros((40, 48), np.uint8)
        mask[:, 20:28] = 1
        if i % 2 == 0:
            mask[10:20, 18:30] = 3  # defect on even samples
        cv2.imwrite(str(img_dir / f"f{i}.jpg"), img)
        cv2.imwrite(str(mask_dir / f"f{i}.png"), mask)
    return str(img_dir), str(mask_dir)


def test_segmentation_dataset(seg_folder):
    from unet_tpu.data import SegmentationDataset
    ds = SegmentationDataset(*seg_folder, target_size=(32, 32))
    assert len(ds) == 6
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert mask.shape == (32, 32) and mask.dtype == np.int32
    assert set(np.unique(mask)) <= {0, 1, 3}


def test_dataset_remap(seg_folder):
    from unet_tpu.data import REMAP_7_TO_3, SegmentationDataset
    ds = SegmentationDataset(*seg_folder, target_size=(32, 32),
                             class_remap=REMAP_7_TO_3)
    _, mask = ds[0]
    assert set(np.unique(mask)) <= {0, 1, 2}


def test_sample_weights(seg_folder):
    from unet_tpu.data import SegmentationDataset
    ds = SegmentationDataset(*seg_folder)
    w = ds.sample_weights(boost=2.0)
    assert w[0] == pytest.approx(2 * w[1])
    assert w.sum() == pytest.approx(1.0)


def test_loader_batching(seg_folder):
    from unet_tpu.data import Loader, SegmentationDataset
    ds = SegmentationDataset(*seg_folder, target_size=(32, 32))
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, prefetch=0)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0][0].shape == (4, 32, 32, 3)
    loader2 = Loader(ds, batch_size=4, prefetch=2)
    assert sum(b[0].shape[0] for b in loader2) == 6


def test_advanced_dataset(seg_folder):
    from unet_tpu.data import AdvancedDataset
    ds = AdvancedDataset(*seg_folder, augment=True, target_size=(32, 32),
                         rng=np.random.default_rng(0))
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32)


def test_patch_dataset(seg_folder):
    from unet_tpu.data import PatchDefectDataset
    ds = PatchDefectDataset(*seg_folder, patch_size=24, defect_classes=(3,),
                            rng=np.random.default_rng(0))
    assert len(ds.defect_boxes) == 3
    img, mask = ds[0]  # even idx -> defect-centred
    assert img.shape == (24, 24, 3)
    assert set(np.unique(mask)) <= {0, 1}
    assert mask.sum() > 0  # contains the defect


def test_labelme_conversion(tmp_path):
    import cv2

    from unet_tpu.data.labelme import CLASS_MAP, json_to_mask
    ann = {
        "imageHeight": 40, "imageWidth": 50,
        "shapes": [
            {"label": "cable", "points": [[5, 5], [30, 5], [30, 35], [5, 35]]},
            {"label": "thin_defect", "points": [[10, 10], [20, 10], [20, 20], [10, 20]]},
            {"label": "bulge_defect", "points": [[0, 0], [4, 0], [4, 4], [0, 4]]},
            {"label": "unknown_thing", "points": [[40, 0], [49, 0], [49, 9], [40, 9]]},
        ],
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(ann))
    mask = json_to_mask(str(p))
    golden = np.zeros((40, 50), np.uint8)
    cv2.fillPoly(golden, [np.array(ann["shapes"][0]["points"], np.int32)], 1)
    cv2.fillPoly(golden, [np.array(ann["shapes"][1]["points"], np.int32)],
                 CLASS_MAP["wrap_uneven"])
    assert np.array_equal(mask, golden)  # legacy remap applied; removed/unknown skipped


def test_augment_pipelines(rng):
    from unet_tpu.data import (AugmentationPipeline, StrongAugmentationPipeline,
                               WeakAugmentationPipeline)
    img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    mask = (rng.random((40, 48)) * 3).astype(np.uint8)
    for pipe in (AugmentationPipeline(rng=np.random.default_rng(0)),
                 WeakAugmentationPipeline(rng=np.random.default_rng(0))):
        out_img, out_mask = pipe(img, mask)
        assert out_img.shape == img.shape and out_mask.shape == mask.shape
        assert set(np.unique(out_mask)) <= set(np.unique(mask)) | {0}
    strong = StrongAugmentationPipeline(rng=np.random.default_rng(0))
    out_img, out_mask = strong(img, mask)
    assert out_img.ndim == 3 and out_mask.ndim == 2


def test_random_fog_properties(rng):
    """A.RandomFog-faithful (reference advanced_dataset.py:114): local white
    circular overlays + blur -> brightens, spatially NON-uniform (unlike the
    old global haze), deterministic under a seeded rng, image-only."""
    from unet_tpu.data.augment import random_fog
    img = (rng.random((96, 128, 3)) * 120).astype(np.uint8)
    out = random_fog(img, 0.3, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.astype(int).mean() > img.astype(int).mean()  # fog whitens
    delta = out.astype(int).mean(axis=2) - img.astype(int).mean(axis=2)
    # local circles: per-region brightening varies (global haze would not)
    q = [delta[i:i + 24, j:j + 32].mean() for i in range(0, 96, 24)
         for j in range(0, 128, 32)]
    assert max(q) - min(q) > 1.0
    again = random_fog(img, 0.3, np.random.default_rng(1))
    assert np.array_equal(out, again)


def test_random_rain_properties(rng):
    """A.RandomRain-faithful (reference advanced_dataset.py:115): slanted
    streaks + blur + 0.7x HSV brightness -> darkens overall, adds bright
    streak pixels before the darkening, deterministic."""
    import cv2

    from unet_tpu.data.augment import random_rain
    img = np.full((90, 120, 3), 90, np.uint8)
    out = random_rain(img, 8, np.random.default_rng(2))
    assert out.shape == img.shape and out.dtype == np.uint8
    # brightness_coefficient 0.7 dominates: mean V drops vs the original
    v_in = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)[..., 2].mean()
    v_out = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)[..., 2].mean()
    assert v_out < 0.85 * v_in
    # streaks of drop_color(200) survive the 0.7 scale as pixels brighter
    # than the uniformly-darkened 90 * 0.7 = 63 background
    assert (out.max(axis=2) > 80).mean() > 0.01
    again = random_rain(img, 8, np.random.default_rng(2))
    assert np.array_equal(out, again)
