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
