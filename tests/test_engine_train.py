"""End-to-end engine + training-loop tests (synthetic data, tiny shapes)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    import cv2
    tmp = tmp_path_factory.mktemp("video")
    path = str(tmp / "in.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(12):
        f = rng.uniform(40, 70, (96, 128, 3))
        f[:, 56:72] = (175, 180, 180)
        f[30:66, 52:76] = (60, 90, 200)
        wr.write(np.clip(f + rng.normal(0, 4, f.shape), 0, 255).astype(np.uint8))
    wr.release()
    return path


def test_engine_end_to_end(synth_video, tmp_path):
    import jax
    import jax.numpy as jnp

    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import (EngineConfig, InferenceEngine, PreprocessCfg,
                                   get_preset)
    cfg = get_preset("two_stage").replace(preprocess=PreprocessCfg(model_size=(64, 64)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    eng = InferenceEngine(model, variables, cfg,
                          EngineConfig(batch=4, output_dir=str(tmp_path),
                                       print_interval=100))
    summary = eng.process_video(synth_video)
    assert summary["processed"] == 12
    assert os.path.exists(tmp_path / "result.mp4")
    rows = open(tmp_path / "events.csv").readlines()
    assert len(rows) == 13  # header + 12 frames


def test_engine_window_mode(synth_video, tmp_path):
    import jax
    import jax.numpy as jnp

    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import (EngineConfig, InferenceEngine, PreprocessCfg,
                                   get_preset)
    cfg = get_preset("production").replace(preprocess=PreprocessCfg(model_size=(64, 64)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    eng = InferenceEngine(model, variables, cfg,
                          EngineConfig(batch=4, output_dir=str(tmp_path),
                                       window_enabled=True, window_min_frames=3,
                                       window_max_frames=4, write_video=False))
    summary = eng.process_video(synth_video)
    assert summary["total_windows"] == 3
    jsonl = tmp_path / "events" / "inspection_events.jsonl"
    assert jsonl.exists()
    recs = [json.loads(l) for l in open(jsonl)]
    assert len(recs) == 3
    assert all("window_info" in r and "metrics" in r for r in recs)


@pytest.fixture
def synth_dataset():
    """Trivially learnable vertical-strip dataset."""
    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            img = rng.uniform(0.1, 0.3, (32, 32, 3)).astype(np.float32)
            img[:, 12:20] = 0.8
            mask = np.zeros((32, 32), np.int32)
            mask[:, 12:20] = 1
            return img, mask
    return DS()


@pytest.mark.slow
def test_overfit_gate(synth_dataset):
    from unet_tpu.models import SimpleUNet
    from unet_tpu.train import overfit_test
    model = SimpleUNet(num_classes=2)
    miou = overfit_test(model, synth_dataset, n_samples=4, steps=40,
                        num_classes=2, image_size=32, lr=3e-3)
    assert miou > 0.9  # trivially separable scene must be learnable


@pytest.mark.slow
def test_train_model_loop(synth_dataset, tmp_path):
    from unet_tpu.data.loader import Loader
    from unet_tpu.models import SimpleUNet
    from unet_tpu.train import LossCfg, OptimCfg, TrainRunCfg, train_model

    loader = Loader(synth_dataset, batch_size=2, shuffle=True, prefetch=0, seed=0)
    cfg = TrainRunCfg(epochs=2, num_classes=2, image_size=32, target_miou=None,
                      ckpt_dir=str(tmp_path), save_every_epochs=100,
                      loss=LossCfg(kind="ce"),
                      optim=OptimCfg(lr=1e-3, schedule="constant", total_steps=10))
    model = SimpleUNet(num_classes=2)
    result = train_model(model, loader, loader, cfg)
    assert result["epochs_run"] == 2
    assert (tmp_path / "last.meta.json").exists()
    assert (tmp_path / "training_history.json").exists()
    hist = json.loads((tmp_path / "training_history.json").read_text())
    assert len(hist["history"]["loss"]) == 2


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from unet_tpu.core.checkpoint import (load_model_variables,
                                          restore_checkpoint, save_checkpoint,
                                          save_variables)
    from unet_tpu.models import SimpleUNet
    from unet_tpu.train import OptimCfg, create_train_state

    model = SimpleUNet(num_classes=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3),
                               OptimCfg(total_steps=10))
    save_checkpoint(str(tmp_path), state, epoch=7, best_miou=0.5, name="best")
    state2, meta = restore_checkpoint(str(tmp_path), state, name="best")
    assert meta["epoch"] == 7 and meta["best_miou"] == 0.5
    leaf = jax.tree.leaves(state.params)[0]
    leaf2 = jax.tree.leaves(state2.params)[0]
    assert np.array_equal(np.asarray(leaf), np.asarray(leaf2))

    vp = tmp_path / "vars"
    save_variables(str(vp), {"params": state.params})
    variables, info = load_model_variables(str(vp))
    assert info["num_classes"] == 3
    assert "params" in variables


@pytest.mark.slow
def test_worst_sample_tracking(synth_dataset, tmp_path):
    import json

    from unet_tpu.data.loader import Loader
    from unet_tpu.models import SimpleUNet
    from unet_tpu.train import LossCfg, OptimCfg, TrainRunCfg, train_model

    loader = Loader(synth_dataset, batch_size=2, shuffle=True, prefetch=0,
                    seed=0, with_indices=True)
    val = Loader(synth_dataset, batch_size=2, prefetch=0)
    cfg = TrainRunCfg(epochs=1, num_classes=2, image_size=32, target_miou=None,
                      ckpt_dir=str(tmp_path), save_every_epochs=100,
                      track_worst_samples=3, loss=LossCfg(kind="ce"),
                      optim=OptimCfg(lr=1e-3, schedule="constant", total_steps=10))
    train_model(SimpleUNet(num_classes=2), loader, val, cfg)
    worst = json.loads((tmp_path / "worst_samples.json").read_text())
    assert worst["epoch"] == 0 and len(worst["worst"]) == 3
    assert all(isinstance(w[0], float) and w[0] >= 0 for w in worst["worst"])


@pytest.mark.slow
def test_bf16_remat_training_converges(synth_dataset):
    """Recipes train in bf16 compute (the reference's AMP analogue,
    tools/train.py:115-136) with optional ConvBlock remat; the combination
    must still learn a trivially separable scene, with params kept f32."""
    import jax.numpy as jnp

    from unet_tpu.models import NestedUNet
    from unet_tpu.train import overfit_test

    model = NestedUNet(num_classes=2, deep_supervision=False,
                       dtype=jnp.bfloat16, remat=True)
    miou = overfit_test(model, synth_dataset, n_samples=4, steps=60,
                        num_classes=2, image_size=32, lr=3e-3)
    assert miou > 0.9
