"""int8 calibration-degradation curve (VERDICT r4 weak #1b/#1c).

test_quantized.test_agreement_threshold_is_derived proves the CLI's 0.995
class-map-agreement auto-fallback threshold separates ONE within-budget
point (well-calibrated, x1) from ONE out-of-budget point (x5 scales); the
round-4 docstrings promised a full x1.5..x16 curve that was never recorded.
This records it: for each activation-scale multiplier the held-out-frame
class-map agreement vs the float model and the mIoU drop vs labels, on the
same de-saturated hard-scene setup as the test (float mIoU ~0.83, so mIoU
can actually move).

Run: timeout 590 python docs/experiments/measure_int8_degradation.py  (CPU ok)
Recorded: docs/PARITY.md §3.
"""
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    tempfile.gettempdir(), f"unet_tpu_jax_cache_{os.getuid()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from conftest import hard_cable_scene
from unet_tpu.models import NestedUNet
from unet_tpu.models.quantized import calibrate, int8_apply
from unet_tpu.ops.seg_metrics import metrics_from_confusion
from unet_tpu.train import LossCfg, OptimCfg, create_train_state
from unet_tpu.train.trainer import make_train_step

MULTIPLIERS = (1.0, 1.5, 2.0, 3.0, 5.0, 8.0, 16.0)
MIOU_BUDGET = 0.005       # cli gate: mIoU(int8) >= mIoU(float) - 0.5 %
AGREE_THRESHOLD = 0.995   # cli auto-fallback threshold under derivation


def _miou(preds, vy):
    cm = np.zeros((3, 3), np.int64)
    np.add.at(cm, (vy.ravel(), np.asarray(preds).ravel()), 1)
    return metrics_from_confusion(cm)[0]


def main():
    # identical recipe to tests/test_quantized.py::trained
    imgs, masks = zip(*[hard_cable_scene(seed=s) for s in range(8)])
    images = np.stack(imgs).astype(np.float32) / 255.0
    labels = np.stack(masks).astype(np.int32)
    model = NestedUNet(num_classes=3, deep_supervision=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3),
                               OptimCfg(lr=3e-3, schedule="constant",
                                        total_steps=120, clip_norm=10.0))
    step = jax.jit(make_train_step(LossCfg(kind="ce")))
    t0 = time.time()
    for _ in range(120):
        state, _ = step(state, images, labels)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"# trained 120 steps in {time.time() - t0:.0f}s")

    # held-out val set (same seeds as test_quantized._val_set)
    val = [hard_cable_scene(seed=500 + s) for s in range(8)]
    vx = np.stack([v[0] for v in val]).astype(np.float32) / 255.0
    vy = np.stack([v[1] for v in val]).astype(np.int32)

    ref = np.asarray(jnp.argmax(model.apply(variables, jnp.asarray(vx),
                                            train=False), -1))
    miou_f = _miou(ref, vy)
    print(f"# float val mIoU {miou_f:.4f} (discriminating band 0.75..0.97)")
    scales = calibrate(variables, [images[:4], images[4:]])

    print(f"{'xscale':>7} {'agreement':>10} {'mIoU':>8} {'drop':>8} "
          f"{'in_budget':>9} {'above_thresh':>12} {'classified_ok':>13}")
    for m in MULTIPLIERS:
        degraded = [(k, s * m) for k, s in scales]
        q = np.asarray(jnp.argmax(int8_apply(variables, jnp.asarray(vx),
                                             degraded), -1))
        agree = float((q == ref).mean())
        miou_q = _miou(q, vy)
        drop = miou_f - miou_q
        in_budget = drop <= MIOU_BUDGET
        above = agree >= AGREE_THRESHOLD
        # the threshold classifies correctly when (above <=> in_budget)
        print(f"{m:>7.1f} {agree:>10.5f} {miou_q:>8.4f} {drop:>+8.4f} "
              f"{str(in_budget):>9} {str(above):>12} "
              f"{str(above == in_budget):>13}")


if __name__ == "__main__":
    main()
