"""Full-program bisection of the `enhanced` preset cost (VERDICT r2 item 2).

profile_enhanced.py times stages in ISOLATION and their net sum (~58 ms/b16)
is far under the full program (~140-174 ms/b16) — so the wall is contextual.
This times the FULL fused run_pipeline under cfg variants that disable one
piece at a time, pipelined dispatch (8 in flight), best of 3.

Run: timeout 590 python docs/experiments/bisect_enhanced.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from unet_tpu.core.config import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from unet_tpu.models import NestedUNet
from unet_tpu.pipeline import get_preset, stages

B = 16
rng = np.random.default_rng(0)
bgr = rng.uniform(40, 70, (B, 448, 800, 3))
x0 = int(800 * 0.425)
bgr[:, :, x0:x0 + 60] = (175.0, 180.0, 180.0)
bgr[:, 448 // 3:2 * 448 // 3, x0 - 8:x0 + 68] = (60.0, 90.0, 200.0)
bgr += rng.normal(0, 4, bgr.shape)
raw = jnp.asarray(np.clip(bgr, 0, 255).astype(np.uint8))

base = get_preset("enhanced").replace_in("segment", fast_forward=True)
model = NestedUNet(num_classes=3, deep_supervision=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
                       train=False)


def timed(name, cfg, iters=24, repeats=3):
    step = stages.build_step(model, cfg)
    out = step(variables, raw)
    _ = np.asarray(out.cable_px)
    ts = []
    for _r in range(repeats):
        t0 = time.perf_counter()
        outs = [step(variables, raw) for _ in range(iters)]
        for o in outs:
            _ = np.asarray(o.cable_px), np.asarray(o.burr_px)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"{name:44s} {dt * 1000:8.2f} ms/b{B}  -> {B / dt:7.1f} FPS",
          flush=True)


timed("enhanced FULL", base)
timed("  - burr none", base.replace_in("burr", method="none"))
timed("  - enhance off", base.replace_in("preprocess", enhance=False))
timed("  - burr canny_band (same band/SEs)",
      base.replace_in("burr", method="canny_band"))
timed("  - band 8 + SE 3/2 (two_stage geometry)",
      base.replace_in("burr", band_px=8, close_ksize=3, open_ksize=2))
_orig_ccf = stages._cc_filter
stages._cc_filter = lambda cand, b: cand
timed("  - CC filter patched to identity", base.replace_in("burr", band_px=26))
stages._cc_filter = _orig_ccf
timed("two_stage FULL (for reference)",
      get_preset("two_stage").replace_in("segment", fast_forward=True))
