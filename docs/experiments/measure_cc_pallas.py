"""TPU A/B of the CC routing (VERDICT r3 item 2): XLA while_loop vs the
single-launch Pallas propagation kernel (ops/cc_pallas.py), on the FULL
fused programs that ship — enhanced and two_stage presets, pipelined
dispatch, best of 3. Toggled via UNET_TPU_CC_PALLAS, which _pallas_ok reads
at trace time, so each build_step traces with the intended routing.

Run (needs the TPU tunnel up): timeout 590 python docs/experiments/measure_cc_pallas.py
"""
import os
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

model = NestedUNet(num_classes=3, deep_supervision=True, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
                       train=False)


def timed(name, cfg, iters=24, repeats=3):
    step = stages.build_step(model, cfg)
    out = step(variables, raw)
    np.asarray(out.cable_px)
    ts = []
    for _r in range(repeats):
        t0 = time.perf_counter()
        outs = [step(variables, raw) for _ in range(iters)]
        for o in outs:
            np.asarray(o.cable_px), np.asarray(o.burr_px)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    print(f"{name:52s} {dt * 1000:8.2f} ms/b{B}  -> {B / dt:7.1f} FPS",
          flush=True)
    return B / dt


presets = {
    "two_stage": get_preset("two_stage").replace_in("segment", fast_forward=True),
    "enhanced": get_preset("enhanced").replace_in("segment", fast_forward=True),
}
results = {}
for routing in ("0", "1"):
    os.environ["UNET_TPU_CC_PALLAS"] = routing
    tag = "pallas" if routing == "1" else "xla   "
    for pname, cfg in presets.items():
        results[(pname, routing)] = timed(f"{pname} FULL  [cc={tag}]", cfg)

print()
for pname in presets:
    a, b = results[(pname, "0")], results[(pname, "1")]
    print(f"{pname}: xla {a:.1f} -> pallas {b:.1f} FPS  ({b / a - 1:+.1%})")
