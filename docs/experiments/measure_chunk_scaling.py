"""Chunk-size scaling of stages.build_chunked_step (VERDICT r2 weak #6:
"fewer kernels / larger scan chunks" lever). K batches run as one lax.scan
device program, so per-program launch overhead amortizes over K*B frames.
Measures the shipped two_stage + enhanced programs at K in {1,2,4,8,16},
batch 16, bf16, Pallas CC routing (default).

Run: timeout 1700 python docs/experiments/measure_chunk_scaling.py
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
bgr = rng.uniform(40, 70, (16 * B, 448, 800, 3))
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
    step = stages.build_step(model, cfg)
    chunked = stages.build_chunked_step(model, cfg)
    for K in (1, 2, 4, 8, 16):
        frames = jnp.asarray(frames_np[:K * B].reshape((K, B, 448, 800, 3)))
        fn = (lambda v, f: step(v, f[0])) if K == 1 else chunked
        out = fn(variables, frames)
        np.asarray(out.cable_px)
        iters = max(2, 48 // K)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(variables, frames) for _ in range(iters)]
            for o in outs:
                np.asarray(o.cable_px), np.asarray(o.burr_px)
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / (iters * K * B)
        print(f"{pname:10s} K={K:2d}  {dt * 1000 * B:8.2f} ms/b{B}"
              f"  -> {1.0 / dt:7.1f} FPS", flush=True)
