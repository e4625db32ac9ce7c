"""Parity of the single-launch Pallas NLM kernel vs the XLA scan path.

The kernel (ops/nlm_pallas.py) must reproduce ops/frames.nlm_denoise —
same reflect-padded geometry, same center-weight-1 convention — up to
float summation order. On CPU the kernel runs in interpreter mode, which
is exactly how these tests exercise it (ops/cc_pallas.py's pattern).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _xla_nlm(img, h, template, search):
    """The XLA path, forced (routing never picks Pallas off-TPU, but be
    explicit against future routing changes)."""
    import os
    from unet_tpu.ops import frames
    os.environ["UNET_TPU_NLM_PALLAS"] = "0"
    try:
        return np.asarray(frames.nlm_denoise(jnp.asarray(img), h=h,
                                             template=template, search=search))
    finally:
        os.environ.pop("UNET_TPU_NLM_PALLAS", None)


def _pallas_nlm(img, h, template, search):
    from unet_tpu.ops import nlm_pallas
    r, tr = search // 2, template // 2
    pad = r + tr
    x = jnp.pad(jnp.asarray(img, jnp.float32),
                ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    out = nlm_pallas.nlm_padded(x, h, template, search)
    return np.asarray(out[:, pad:-pad, pad:-pad])


@pytest.mark.parametrize("search,template", [(9, 5), (21, 7)])
def test_nlm_pallas_matches_xla(rng, search, template):
    img = (rng.random((2, 40, 56)) * 255).astype(np.float32)
    ref = _xla_nlm(img, 10.0, template, search)
    out = _pallas_nlm(img, 10.0, template, search)
    assert ref.shape == out.shape == (2, 40, 56)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-3)


def test_nlm_pallas_denoises(rng):
    """Quality smoke: on a noisy flat image the kernel output must be much
    closer to the clean signal than the input was."""
    clean = np.full((1, 40, 56), 128.0, np.float32)
    noisy = clean + rng.normal(0, 12, clean.shape).astype(np.float32)
    out = _pallas_nlm(noisy, 10.0, 7, 21)
    assert np.abs(out - clean).mean() < 0.4 * np.abs(noisy - clean).mean()
