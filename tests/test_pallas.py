"""Pallas fused-kernel correctness (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_tpu.ops.pallas import conv_block_fused, fold_bn, fused_conv_bn_relu


@pytest.fixture
def convdata(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=16).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=16).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=16).astype(np.float32) * 0.1)
    return x, k, gamma, beta, mean, var, cb


def _reference(x, k, gamma, beta, mean, var, cb):
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + cb
    return jnp.maximum((ref - mean) * gamma * jax.lax.rsqrt(var + 1e-5) + beta, 0.0)


@pytest.mark.parametrize("row_tile", [1, 4, 8, 16])
def test_fused_conv_bn_relu(convdata, row_tile):
    x, k, gamma, beta, mean, var, cb = convdata
    scale, bias = fold_bn(gamma, beta, mean, var, conv_bias=cb)
    got = fused_conv_bn_relu(x, k, scale, bias, row_tile=row_tile, interpret=True)
    want = _reference(x, k, gamma, beta, mean, var, cb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv_block_fused_matches_flax(rng):
    from unet_tpu.models.blocks import ConvBlock
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 6)).astype(np.float32))
    m = ConvBlock(12)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    want = m.apply(variables, x, train=False)
    got = conv_block_fused(x, variables["params"], variables["batch_stats"],
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_nested_unet_fused_forward(rng):
    from unet_tpu.models import NestedUNet
    from unet_tpu.models.fast_forward import nested_unet_forward_fused
    model = NestedUNet(num_classes=3, deep_supervision=True)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)
    got = nested_unet_forward_fused(variables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    assert np.array_equal(np.asarray(got).argmax(-1), np.asarray(want).argmax(-1))
