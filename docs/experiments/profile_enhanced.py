"""Per-stage wall profile of the `enhanced` preset on the TPU (VERDICT r2
item 2: find the 114-FPS wall and push config 3 to >= 150 FPS).

Times jitted sub-programs in isolation at the production 800x448 / batch-16
footing. Each sub-program includes a tiny sum so a real value is pulled back
(the relay backend's block_until_ready is unreliable).

Run: timeout 590 python docs/experiments/profile_enhanced.py
"""
import sys
import time
from pathlib import Path

import numpy as np

# NB: sys.path, not PYTHONPATH — a PYTHONPATH entry breaks this image's
# axon PJRT plugin discovery (backend 'axon' not in known backends)
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from unet_tpu.core.config import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from unet_tpu.models import NestedUNet
from unet_tpu.models import fast_forward as _ff
from unet_tpu.ops import clahe as _clahe
from unet_tpu.ops import color as _color
from unet_tpu.ops import edges as _edges
from unet_tpu.ops import image as _image
from unet_tpu.pipeline import get_preset, stages

B = 16
cfg = get_preset("enhanced").replace_in("segment", fast_forward=True)
model = NestedUNet(num_classes=3, deep_supervision=True, dtype=jnp.bfloat16)
w, h = cfg.preprocess.model_size
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                       train=False)

rng = np.random.default_rng(0)
# raw frames: 448x800 so rotate90 -> 800x448 matches the preset's pipeline
raw = rng.integers(0, 255, (B, 448, 800, 3), dtype=np.uint8)
raw = jnp.asarray(raw)

frames = stages.geometric_preprocess(raw, cfg)  # device-resident float BGR


def timed(name, fn, *args, iters=20):
    f = jax.jit(fn)
    r = f(*args)
    _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])  # sync
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    for o in outs:
        _ = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1000 / B:7.3f} ms/frame  {dt * 1000:8.2f} ms/b{B}",
          flush=True)
    return dt


timed("geometric_preprocess (rotate+normalize)",
      lambda x: jnp.sum(stages.geometric_preprocess(x, cfg)), raw)

timed("enhance: bgr2lab+clahe+lab2bgr",
      lambda x: jnp.sum(_color.lab2bgr(
          _clahe.clahe(jnp.clip(jnp.round(_color.bgr2lab(x)[0]), 0, 255),
                       cfg.preprocess.clahe_clip, cfg.preprocess.clahe_grid),
          *_color.bgr2lab(x)[1:])), frames)

timed("enhance: bilateral d=7",
      lambda x: jnp.sum(_image.bilateral_filter(x, d=7, sigma_color=25.0,
                                                sigma_space=5.0)), frames)

timed("enhance: sharpen",
      lambda x: jnp.sum(jnp.clip(_image.sharpen(x), 0, 255)), frames)

timed("enhance: FULL",
      lambda x: jnp.sum(stages.enhance_frames(x, cfg)), frames)

timed("model_input (resize+normalize)",
      lambda x: jnp.sum(stages.model_input(x, cfg)), frames)

x_model = stages.model_input(frames, cfg)
timed("fast_forward 512^2",
      lambda v, x: jnp.sum(_ff.fast_apply(v, x, dtype=jnp.bfloat16)[..., 0]),
      variables, x_model)

gray = _color.bgr2gray(frames)
cable = jnp.zeros(gray.shape, bool).at[:, :, 340:400].set(True)

timed("full-frame sobel max (mag_max)",
      lambda g: jnp.sum(jnp.max(_edges.sobel_magnitude(g), axis=(-2, -1))),
      gray)

timed("burr multiscale on ROI crop",
      lambda g, c: jnp.sum(stages._burr_on_roi_crop(
          g, c, cfg, stages.burr_multiscale, (800, 448))), gray, cable)

step = stages.build_step(model, cfg)
out = step(variables, raw)
_ = np.asarray(out.cable_px)
t0 = time.perf_counter()
N = 10
outs = [step(variables, raw) for _ in range(N)]
for o in outs:
    _ = np.asarray(o.cable_px), np.asarray(o.tape_px), np.asarray(o.burr_px)
dt = (time.perf_counter() - t0) / N
print(f"{'FULL enhanced pipeline':42s} {dt * 1000 / B:7.3f} ms/frame "
      f"-> {B / dt:7.1f} FPS", flush=True)
