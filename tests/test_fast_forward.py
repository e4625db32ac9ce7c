"""Phase-packed fast forward == Flax NestedUNet forward.

The packed conv computes the same sums with 7 extra exact-zero taps and a
different accumulation order, so f32 agreement is tight; bf16 is compared
at class-decision level.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def model_and_vars():
    from unet_tpu.models import NestedUNet
    model = NestedUNet(num_classes=3, deep_supervision=True)
    rng = jax.random.PRNGKey(7)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    # randomize BN stats so folding is actually exercised (init is mean 0/var 1)
    import flax
    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    keys = jax.random.split(jax.random.PRNGKey(3), len(flat))
    for k, (path, v) in zip(keys, flat.items()):
        if path[0] == "batch_stats" and path[-1] == "mean":
            v = jax.random.normal(k, v.shape) * 0.2
        elif path[0] == "batch_stats" and path[-1] == "var":
            v = jnp.abs(jax.random.normal(k, v.shape)) * 0.5 + 0.5
        elif path[-1] in ("scale",):
            v = 1.0 + jax.random.normal(k, v.shape) * 0.1
        elif path[-1] == "bias":
            v = jax.random.normal(k, v.shape) * 0.05
        out[path] = v
    return model, flax.traverse_util.unflatten_dict(out)


@pytest.mark.slow
def test_fast_forward_f32_matches_flax(model_and_vars, rng):
    from unet_tpu.models.fast_forward import fast_apply
    model, variables = model_and_vars
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    fast = np.asarray(fast_apply(variables, x, dtype=jnp.float32))
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-4)


def test_packed_equals_unpacked_weights(model_and_vars, rng):
    """The packing transform itself: packed layers vs the same fast path
    with packing disabled must agree exactly up to reassociation."""
    from unet_tpu.models.fast_forward import (nested_unet_forward_fast,
                                              prepare_fast_params)
    model, variables = model_and_vars
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    packed = prepare_fast_params(variables, jnp.float32)
    plain = prepare_fast_params(variables, jnp.float32, pack_max_cout=0)
    assert any(l.packed for pair in packed.blocks.values() for l in pair)
    assert not any(l.packed for pair in plain.blocks.values() for l in pair)
    a = np.asarray(nested_unet_forward_fast(packed, x))
    b = np.asarray(nested_unet_forward_fast(plain, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fast_forward_bf16_class_map(model_and_vars, rng):
    """bf16 packed forward agrees with the bf16 Flax forward at the class
    level on ~all pixels (ties under bf16 rounding may flip)."""
    from unet_tpu.models import NestedUNet
    from unet_tpu.models.fast_forward import fast_apply
    _, variables = model_and_vars
    bf16_model = NestedUNet(num_classes=3, deep_supervision=True,
                            dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(jnp.argmax(bf16_model.apply(variables, x, train=False), -1))
    fast = np.asarray(jnp.argmax(fast_apply(variables, x), -1))
    assert (fast == ref).mean() > 0.995


def test_phase_helpers(rng):
    from unet_tpu.models.blocks import max_pool2
    from unet_tpu.models.fast_forward import phase_max, unpack_phases
    y = jnp.asarray(rng.random((2, 8, 8, 4 * 5)), jnp.float32)  # packed, C=5
    full = unpack_phases(y)
    assert full.shape == (2, 16, 16, 5)
    # phase (a, b) of packed pixel (i, j) is unpacked pixel (2i+a, 2j+b)
    np.testing.assert_array_equal(np.asarray(full[:, 3, 5]),
                                  np.asarray(y[:, 1, 2].reshape(2, 4, 5)[:, 1 * 2 + 1]))
    np.testing.assert_allclose(np.asarray(phase_max(y)),
                               np.asarray(max_pool2(full)), rtol=0, atol=0)


def test_pipeline_fast_forward_flag(model_and_vars, rng):
    """run_pipeline(fast_forward=True) == run_pipeline(False) masks."""
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg, stages
    model, variables = model_and_vars
    frames = (rng.random((2, 96, 128, 3)) * 255).astype(np.uint8)
    base = PipelineCfg(preprocess=PreprocessCfg(model_size=(64, 64)))
    slow = stages.build_step(model, base)(variables, frames)
    fast = stages.build_step(
        model, base.replace_in("segment", fast_forward=True))(variables, frames)
    agree = (np.asarray(fast.class_map) == np.asarray(slow.class_map)).mean()
    assert agree > 0.995


def test_fast_forward_rejects_resnet50():
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import PipelineCfg, PreprocessCfg, stages
    model = NestedUNet(num_classes=3, deep_supervision=True,
                       pretrained_encoder=True)
    cfg = PipelineCfg(preprocess=PreprocessCfg(model_size=(64, 64)))
    cfg = cfg.replace_in("segment", fast_forward=True)
    with pytest.raises(ValueError, match="fast_forward"):
        stages.run_pipeline({}, jnp.zeros((1, 64, 64, 3), jnp.uint8),
                            model=model, cfg=cfg)
