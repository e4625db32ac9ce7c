"""Batch scaling past bench.py's b32 ceiling (follow-up to PERF.md 3e: with
program-boundary overhead amortized at K=2, the residual is per-KERNEL launch
floors inside the program — which amortize with BATCH, same kernel count on
bigger operands, until compute/bandwidth binds).

Measures the shipped chunked two_stage + enhanced programs (bf16, Pallas CC
routing) at batch {16, 32, 64, 96, 128, 160}, K=2. Measured (TPU v5e,
docs/PERF.md 3f): still rising at 128 (two_stage 331 FPS, enhanced 193);
160 OOMs at 800x448.

Run: timeout 3000 python docs/experiments/measure_batch_scaling.py
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

K = 2
rng = np.random.default_rng(0)
bgr = rng.uniform(40, 70, (K * 96, 448, 800, 3))
x0 = int(800 * 0.425)
bgr[:, :, x0:x0 + 60] = (175.0, 180.0, 180.0)
bgr[:, 448 // 3:2 * 448 // 3, x0 - 8:x0 + 68] = (60.0, 90.0, 200.0)
bgr += rng.normal(0, 4, bgr.shape)
frames_np = np.clip(bgr, 0, 255).astype(np.uint8)

model = NestedUNet(num_classes=3, deep_supervision=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
                       train=False)

for pname in ("two_stage", "enhanced"):
    cfg = get_preset(pname).replace_in("segment", fast_forward=True)
    chunked = stages.build_chunked_step(model, cfg)
    for B in (16, 32, 64, 96, 128, 160):
        reps = (K * B) // len(frames_np) + 1
        pool = np.concatenate([frames_np] * reps)[:K * B]
        frames = jnp.asarray(pool.reshape((K, B, 448, 800, 3)))
        try:
            out = chunked(variables, frames)
            np.asarray(out.cable_px)
        except Exception as e:  # OOM etc. — report and move on
            print(f"{pname:10s} B={B:3d}  FAILED: {type(e).__name__}",
                  flush=True)
            continue
        iters = max(2, 96 // B)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [chunked(variables, frames) for _ in range(iters)]
            for o in outs:
                np.asarray(o.cable_px), np.asarray(o.burr_px)
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (iters * K * B)
        print(f"{pname:10s} B={B:3d}  {dt * 1000:8.3f} ms/frame"
              f"  -> {1.0 / dt:7.1f} FPS", flush=True)
