"""Test harness config: force CPU JAX with 8 virtual devices so sharding /
collective tests run without TPU hardware (the SURVEY §4 strategy)."""
import os

# Must be set before jax initializes its backend (conftest imports first).
# NB: this environment force-sets JAX_PLATFORMS=axon at a level that wins
# over the env var, so the platform is pinned via jax.config below instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# This JAX build's DEFAULT matmul/conv precision is reduced (bf16-style MXU
# passes) even on CPU; parity tests against torch need full f32 accumulate.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the suite is compile-dominated (~15 min cold);
# re-runs hit the disk cache instead.
import tempfile

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UNET_TPU_JAX_CACHE", os.path.join(
                      tempfile.gettempdir(),
                      f"unet_tpu_jax_cache_{os.getuid()}")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def synthetic_cable_frame(h=96, w=128, cable_x=(50, 70), tape_y=(30, 70), seed=0):
    """Tiny synthetic scene shaped like the real footage: vertical cable strip,
    tape band over its middle, textured background. Returns (bgr, mask) with
    mask classes {0: bg, 1: cable, 2: tape}."""
    r = np.random.default_rng(seed)
    bgr = (r.uniform(40, 70, (h, w, 3))).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    x1, x2 = cable_x
    mask[:, x1:x2] = 1
    bgr[:, x1:x2] = (180, 180, 175)
    y1, y2 = tape_y
    mask[y1:y2, x1 - 4:x2 + 4] = 2
    bgr[y1:y2, x1 - 4:x2 + 4] = (60, 90, 200)
    noise = r.normal(0, 6, (h, w, 3))
    return np.clip(bgr.astype(np.int16) + noise, 0, 255).astype(np.uint8), mask


@pytest.fixture
def cable_scene():
    return synthetic_cable_frame()


def hard_cable_scene(seed, h=64, w=64):
    """HARD synthetic cable scene for non-saturated accuracy gates (VERDICT
    r3 item 2): low-contrast cable (+12..40 over a 50..110 textured base with
    sigma-12 sensor noise), thin tape bands whose color shift can approach the
    noise floor, per-scene brightness/gradient variation, and 0-2 bg-colored
    occluder blobs that keep their labels. A model trained on 8 such scenes
    reaches val mIoU ~0.83 on held-out seeds (vs 1.00 on
    synthetic_cable_frame) — hard enough that a 1-2 % accuracy regression is
    measurable, which the saturated scenes could not detect."""
    r = np.random.default_rng(seed)
    base = r.uniform(50, 110)
    bgr = r.uniform(base - 15, base + 15, (h, w, 3))
    gy = np.linspace(0, r.uniform(-25, 25), h)[:, None, None]
    gx = np.linspace(0, r.uniform(-25, 25), w)[None, :, None]
    bgr = bgr + gy + gx
    mask = np.zeros((h, w), np.uint8)
    cable_w = int(r.integers(6, max(8, w // 3)))
    x1 = int(r.integers(2, w - cable_w - 2))
    x2 = x1 + cable_w
    bgr[:, x1:x2] += r.uniform(12, 40)  # low-contrast cable
    mask[:, x1:x2] = 1
    th = int(r.integers(3, h // 3))  # tape band, possibly very thin
    y1 = int(r.integers(0, h - th))
    pad = int(r.integers(1, 4))
    xa, xb = max(0, x1 - pad), min(w, x2 + pad)
    tape_shift = r.uniform(10, 45)  # red shift, sometimes near noise floor
    bgr[y1:y1 + th, xa:xb, 2] += tape_shift
    bgr[y1:y1 + th, xa:xb, :2] -= tape_shift * 0.3
    mask[y1:y1 + th, xa:xb] = 2
    for _ in range(int(r.integers(0, 3))):  # occluders keep their labels
        bh, bw = int(r.integers(4, 10)), int(r.integers(4, 10))
        by, bx = int(r.integers(0, h - bh)), int(r.integers(0, w - bw))
        bgr[by:by + bh, bx:bx + bw] = base + r.normal(0, 5)
    bgr += r.normal(0, 12, bgr.shape)
    return np.clip(bgr, 0, 255).astype(np.uint8), mask
