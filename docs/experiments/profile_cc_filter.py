"""Isolate the enhanced-preset CC-filter cost (VERDICT r2 item 2 follow-up).

bisect_enhanced.py shows `_cc_filter` costs ~33 ms/b16 in the full program
even with the Pallas propagation kernel active. This script captures the
actual multiscale burr candidate mask at the ROI-crop shape (by patching the
filter to identity and reading class_map==3), then times
(a) the Pallas vs XLA filter, (b) `cc_pallas.propagate` at fixed iteration
counts to get per-iteration cost and the converged iteration count.

Run: timeout 590 python docs/experiments/profile_cc_filter.py
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
from unet_tpu.ops import cc_pallas
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

# capture the pre-filter candidate: identity-patch the CC filter; the burr
# channel of class_map is then the raw candidate pasted into the frame
orig = stages._cc_filter
stages._cc_filter = lambda cand, b: cand
step_id = stages.build_step(model, cfg)
cand_full = np.asarray(step_id(variables, raw).class_map) == 3
stages._cc_filter = orig

H, W = 448, 800
r = cfg.roi.scaled((W, H)) if cfg.roi.space != (W, H) else cfg.roi
pad = cfg.burr.band_px + max(cfg.burr.close_ksize, cfg.burr.open_ksize) + 24
x1 = max(r.x1 - pad, 0)
x2 = min(r.x2 + pad, W)
y1 = max(r.y1 - pad, 0)
y2 = min(r.y2 + pad, H)
x2 = min(x1 + ((x2 - x1 + 127) // 128) * 128, W)
cand = jnp.asarray(cand_full[:, y1:y2, x1:x2])
Hc, Wc = cand.shape[-2:]
print(f"crop {Hc}x{Wc}  cand px/img:", cand_full.reshape(B, -1).sum(-1))
b = cfg.burr


def timed(name, fn, iters=30):
    x = jax.block_until_ready(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn()
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"{name:46s} {dt * 1000:8.2f} ms/b{B}", flush=True)
    return x


import unet_tpu.ops.cc as ccmod

filt = jax.jit(lambda m: stages._cc_filter(m, b))
timed("filter (pallas)", lambda: filt(cand))

real_ok = ccmod._pallas_ok
ccmod._pallas_ok = lambda *a: False
filt_x = jax.jit(lambda m: _cc.filter_components_by_geometry(
    m, b.min_area, b.max_area, max_aspect=b.max_aspect, min_w=b.min_w,
    min_h=b.min_h, strict_min_wh=b.strict_min_wh))
timed("filter (xla)", lambda: filt_x(cand))
ccmod._pallas_ok = real_ok


def prop(n):
    @jax.jit
    def f(mb):
        fg = mb.astype(jnp.bool_)
        # the real seed channels (shared builder used by the shipped routes)
        state0 = ccmod._bbox_seed_state(fg, with_rank=True)
        return cc_pallas.propagate(state0, fg, pool_iters=4, max_iters=n)

    return f


for n in (1, 2, 4, 8, 64):
    timed(f"propagate C=5 max_iters={n}", lambda f=prop(n): f(cand))

ref = np.asarray(prop(64)(cand))
for n in (1, 2, 3, 4, 6, 8, 12, 16, 24):
    if np.array_equal(np.asarray(prop(n)(cand)), ref):
        print("converged at <=", n, "iterations")
        break
else:
    print("not converged by 24 iterations")
