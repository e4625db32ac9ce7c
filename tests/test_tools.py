"""Tools layer tests (reference tools/ zoo equivalents)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture
def video(tmp_path, rng):
    import cv2
    p = str(tmp_path / "v.mp4")
    wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    base = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    for i in range(20):
        f = base.copy()
        if i >= 10:  # scene change halfway
            f = 255 - f
        f[:, 40 + (i % 3):50 + (i % 3)] = 200
        wr.write(f)
    wr.release()
    return p


def test_extract_frames_dedup(video, tmp_path):
    from unet_tpu.tools import extract_frames
    out = str(tmp_path / "frames")
    n = extract_frames(video, out, fps=10.0, dedup=0.95)
    files = os.listdir(out)
    assert n == len(files)
    assert 2 <= n < 20  # dedup collapsed near-identical frames


def test_ahash_similarity(rng):
    from unet_tpu.tools import ahash, hash_similarity
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    assert hash_similarity(ahash(img), ahash(img)) == 1.0
    assert hash_similarity(ahash(img), ahash(255 - img)) < 0.5


def test_audit_labelme(tmp_path):
    good = {"imageHeight": 50, "imageWidth": 60, "shapes": [
        {"label": "cable", "points": [[5, 5], [30, 5], [30, 40], [5, 40]]}]}
    bad_oob = {"imageHeight": 50, "imageWidth": 60, "shapes": [
        {"label": "tape", "points": [[0, 0], [500, 0], [500, 40]]}]}
    self_x = {"imageHeight": 50, "imageWidth": 60, "shapes": [
        {"label": "cable", "points": [[0, 0], [20, 20], [20, 0], [0, 20]]}]}
    tiny = {"imageHeight": 50, "imageWidth": 60, "shapes": [
        {"label": "burr_defect", "points": [[1, 1], [4, 1], [4, 4], [1, 4]]}]}
    empty = {"imageHeight": 50, "imageWidth": 60, "shapes": [
        {"label": "bulge_defect", "points": [[5, 5], [9, 5], [9, 9]]}]}
    for name, data in [("good", good), ("oob", bad_oob), ("selfx", self_x),
                       ("tiny", tiny), ("empty", empty)]:
        (tmp_path / f"{name}.json").write_text(json.dumps(data))

    from unet_tpu.tools import audit_labelme_dir
    rep = audit_labelme_dir(str(tmp_path))
    assert rep["total"] == 5
    bad_files = {os.path.basename(b["file"]) for b in rep["bad_samples"]}
    assert "oob.json" in bad_files and "selfx.json" in bad_files
    assert "good.json" not in bad_files
    assert any("tiny.json" in t["file"] for t in rep["tiny_objects"])
    # bulge_defect is a removed legacy class -> nothing drawn -> empty mask
    assert any("empty.json" in f for f in rep["empty_masks"])
    assert rep["class_distribution"]["cable"] == 1


def test_diagnose_and_distribution(tmp_path, rng):
    import cv2
    from unet_tpu.tools import class_pixel_distribution, diagnose_mask, remap_masks
    mdir = tmp_path / "masks"
    mdir.mkdir()
    m = np.zeros((32, 32), np.uint8)
    m[:, 10:20] = 1
    m[5:10, 5:25] = 6
    cv2.imwrite(str(mdir / "a.png"), m)
    cv2.imwrite(str(mdir / "b.png"), np.zeros((32, 32), np.uint8))

    d = diagnose_mask(m, num_classes=3, resized_hw=(16, 16))
    assert d["out_of_range"] == [6]
    assert d["values_preserved"]

    dist = class_pixel_distribution(str(mdir), num_classes=7)
    assert dist[1]["images_with"] == 1 and dist[0]["images_with"] == 2
    assert dist[6]["pixels"] == int((m == 6).sum())

    out = tmp_path / "remapped"
    n = remap_masks(str(mdir), str(out), {6: 0})
    assert n == 2
    rm = cv2.imread(str(out / "a.png"), cv2.IMREAD_UNCHANGED)
    assert set(np.unique(rm)) == {0, 1}


def test_calibrate(tmp_path, video):
    from unet_tpu.tools import (load_roi_json, propose_roi_from_video,
                                save_roi_json, scale_from_two_points)
    assert scale_from_two_points((0, 0), (0, 100), 50.0) == pytest.approx(0.5)
    roi = propose_roi_from_video(video, sample_frames=5)
    assert roi["h"] == 64 and 0 <= roi["x"] < roi["x"] + roi["w"] <= 96
    # the bright moving strip at x~40-50 must be inside the proposal
    assert roi["x"] <= 40 and roi["x"] + roi["w"] >= 50
    p = str(tmp_path / "roi.json")
    save_roi_json(p, **{k: roi[k] for k in ("x", "y", "w", "h")})
    assert load_roi_json(p)["w"] == roi["w"]


def test_evaluate_dataset(tmp_path):
    import jax

    from unet_tpu.models import SimpleUNet
    from unet_tpu.tools import evaluate_dataset

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            img = rng.random((32, 32, 3)).astype(np.float32)
            mask = np.zeros((32, 32), np.int32)
            mask[:, 10:20] = 1
            return img, mask

    model = SimpleUNet(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    res = evaluate_dataset(model, variables, DS(), num_classes=2, batch_size=2,
                           output_dir=str(tmp_path))
    assert res["confusion"].sum() == 4 * 32 * 32
    assert (tmp_path / "confusion_matrix.csv").exists()
    assert (tmp_path / "metrics.json").exists()
    assert 0.0 <= res["pixel_accuracy"] <= 1.0


def test_hard_negatives(tmp_path, video):
    import shutil

    from unet_tpu.tools import create_hard_negative_dataset
    vdir = tmp_path / "videos"
    vdir.mkdir()
    shutil.copy(video, vdir / "a.mp4")
    n = create_hard_negative_dataset(str(vdir), str(tmp_path / "hn"),
                                     num_frames=5, frame_size=(64, 64))
    assert n == 5
    assert len(os.listdir(tmp_path / "hn" / "images")) == 5
    import cv2
    m = cv2.imread(str(tmp_path / "hn" / "masks" / "hn_0000.png"),
                   cv2.IMREAD_UNCHANGED)
    assert m.shape == (64, 64) and m.max() == 0


def test_single_image_inference(tmp_path, rng):
    import cv2
    import jax

    from unet_tpu.models import SimpleUNet
    from unet_tpu.tools import SingleImageInference
    model = SimpleUNet(num_classes=3)
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))
    inf = SingleImageInference(model, variables, input_size=32, num_classes=3)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    mask = inf.predict(img)
    assert mask.shape == (48, 64) and mask.dtype == np.uint8
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img)
    paths = inf.predict_and_save(str(p), str(tmp_path / "out"))
    assert all(os.path.exists(v) for v in paths.values())


def test_render_masks(tmp_path, rng):
    import cv2

    from unet_tpu.tools import render_masks
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(3):
        cv2.imwrite(str(tmp_path / "images" / f"x{i}.jpg"),
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(tmp_path / "masks" / f"x{i}.png"),
                    (rng.random((32, 32)) * 3).astype(np.uint8))
    n = render_masks(str(tmp_path / "images"), str(tmp_path / "masks"),
                     str(tmp_path / "viz"))
    assert n == 3 and len(os.listdir(tmp_path / "viz")) == 3
