"""Part 2 of the CC-filter bisection: which piece costs the ~28 ms that
`cc_pallas.propagate` (5.8 ms) doesn't account for inside
`filter_components_by_geometry` on the enhanced-preset candidate?

Run: python docs/experiments/profile_cc_filter2.py
"""
import time
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from unet_tpu.core.config import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from unet_tpu.models import NestedUNet
from unet_tpu.ops import cc as _cc
import unet_tpu.ops.cc as ccmod
from unet_tpu.pipeline import get_preset, stages

B = 16
rng = np.random.default_rng(0)
bgr = rng.uniform(40, 70, (B, 448, 800, 3))
x0 = int(800 * 0.425)
bgr[:, :, x0:x0 + 60] = (175.0, 180.0, 180.0)
bgr[:, 448 // 3:2 * 448 // 3, x0 - 8:x0 + 68] = (60.0, 90.0, 200.0)
bgr += rng.normal(0, 4, bgr.shape)
raw = jnp.asarray(np.clip(bgr, 0, 255).astype(np.uint8))

cfg = get_preset("enhanced").replace_in("segment", fast_forward=True)
model = NestedUNet(num_classes=3, deep_supervision=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
                       train=False)

orig = stages._cc_filter
stages._cc_filter = lambda cand, b: cand
step_id = stages.build_step(model, cfg)
cand_full = np.asarray(step_id(variables, raw).class_map) == 3
stages._cc_filter = orig

H, W = 448, 800
r = cfg.roi.scaled((W, H)) if cfg.roi.space != (W, H) else cfg.roi
pad = cfg.burr.band_px + max(cfg.burr.close_ksize, cfg.burr.open_ksize) + 24
x1 = max(r.x1 - pad, 0)
x2 = min(x1 + ((min(r.x2 + pad, W) - x1 + 127) // 128) * 128, W)
y1 = max(r.y1 - pad, 0)
y2 = min(r.y2 + pad, H)
cand = jnp.asarray(cand_full[:, y1:y2, x1:x2])
b = cfg.burr
print("crop", cand.shape)


def timed(name, fn, iters=30):
    x = jax.block_until_ready(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn()
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts) / iters * 1000:8.2f} ms/b{B}", flush=True)
    return x


# (1) the real fused bbox+rank propagation incl. cumsum rank seed
f1 = jax.jit(lambda m: ccmod._cc_bbox_batched(m, 64, with_rank=True))
timed("_cc_bbox_batched with_rank", lambda: f1(cand))

f1n = jax.jit(lambda m: ccmod._cc_bbox_batched(m, 64, with_rank=False))
timed("_cc_bbox_batched no rank", lambda: f1n(cand))

# (2) heads count alone (run-heads + full cumsum)
f2 = jax.jit(lambda m: jax.vmap(lambda mm: jnp.sum(ccmod._run_heads(
    mm.astype(jnp.bool_)).astype(jnp.int32)))(m))
timed("run-heads count", lambda: f2(cand))

# (3) scatter-path filter (no one-hot einsum)
import os

os.environ["UNET_TPU_CC_NO_ONEHOT"] = "1"
f3 = jax.jit(lambda m: _cc.filter_components_by_geometry(
    m, b.min_area, b.max_area, max_aspect=b.max_aspect, min_w=b.min_w,
    min_h=b.min_h, strict_min_wh=b.strict_min_wh))
timed("filter scatter path", lambda: f3(cand))
del os.environ["UNET_TPU_CC_NO_ONEHOT"]

# (4) full filter, factorized one-hot path
f4 = jax.jit(lambda m: _cc.filter_components_by_geometry(
    m, b.min_area, b.max_area, max_aspect=b.max_aspect, min_w=b.min_w,
    min_h=b.min_h, strict_min_wh=b.strict_min_wh))
timed("filter onehot path (factorized)", lambda: f4(cand))
