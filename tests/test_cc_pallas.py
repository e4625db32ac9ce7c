"""Parity of the single-launch Pallas CC kernel (ops/cc_pallas.py) against
the XLA while_loop path (ops/cc.py) — bit-exact on identical masks.

On CPU the kernel runs in Pallas interpret mode (UNET_TPU_CC_PALLAS=force
routes ops/cc.py through it); on TPU the same code compiles via Mosaic.
Min-propagation converges to a unique fixpoint, so any schedule difference
between the two implementations cannot change the result — these tests
assert exactly that.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_tpu.ops import cc as _cc
from unet_tpu.ops import cc_pallas


def _masks(rng):
    H, W = 64, 128
    noise = rng.random((2, H, W)) < 0.35          # dense worst-case
    snake = np.zeros((1, H, W), bool)             # long snaking contour
    snake[0, 10:12, 5:100] = True
    snake[0, 12:40, 98:100] = True
    snake[0, 40:42, 20:100] = True
    blobs = np.zeros((1, H, W), bool)             # separated blobs + border
    blobs[0, 5:15, 5:25] = True
    blobs[0, 30:34, 60:90] = True
    blobs[0, 0:3, 125:128] = True
    empty = np.zeros((1, H, W), bool)
    return [noise, snake, blobs, empty]


def _seed_state(fg_b):
    B, H, W = fg_b.shape
    rows = np.broadcast_to(np.arange(H, dtype=np.int32)[:, None], (H, W))
    cols = np.broadcast_to(np.arange(W, dtype=np.int32)[None, :], (H, W))
    lab = rows * W + cols
    chans = []
    for i in range(B):
        rk = np.asarray(jnp.cumsum(_cc._run_heads(
            jnp.asarray(fg_b[i])).reshape(-1).astype(jnp.int32))).reshape(H, W)
        chans.append(np.stack([lab, -rows, cols, -cols, rk]))
    return jnp.asarray(np.stack(chans)), jnp.asarray(fg_b)


@pytest.mark.parametrize("case", range(4))
def test_propagate_matches_xla_bbox(rng, case):
    mask = _masks(rng)[case]
    state0, fg = _seed_state(mask)
    out = np.asarray(cc_pallas.propagate(state0, fg, pool_iters=4,
                                         max_iters=64))
    for i in range(mask.shape[0]):
        l, mnr, mxr, mnc, mxc, rank = _cc._cc_bbox_single(
            jnp.asarray(mask[i]), 64, with_rank=True)
        fgm = mask[i]
        assert np.array_equal(np.where(fgm, out[i, 0], -1), np.asarray(l))
        assert np.array_equal(np.where(fgm, -out[i, 1], 0),
                              np.where(fgm, np.asarray(mxr), 0))
        assert np.array_equal(np.where(fgm, out[i, 2], 0),
                              np.where(fgm, np.asarray(mnc), 0))
        assert np.array_equal(np.where(fgm, -out[i, 3], 0),
                              np.where(fgm, np.asarray(mxc), 0))
        assert np.array_equal(np.where(fgm, out[i, 4], 0),
                              np.where(fgm, np.asarray(rank), 0))


@pytest.mark.parametrize("connectivity", [4, 8])
def test_labels_match_xla(rng, connectivity):
    mask = _masks(rng)[0]
    B, H, W = mask.shape
    rows = np.broadcast_to(np.arange(H, dtype=np.int32)[:, None], (H, W))
    cols = np.broadcast_to(np.arange(W, dtype=np.int32)[None, :], (H, W))
    state0 = jnp.asarray(np.broadcast_to(
        (rows * W + cols)[None, None], (B, 1, H, W)))
    out = np.asarray(cc_pallas.propagate(
        state0, jnp.asarray(mask), pool_iters=16, max_iters=64,
        connectivity=connectivity))
    ref = np.asarray(_cc.connected_components(jnp.asarray(mask),
                                              connectivity=connectivity))
    assert np.array_equal(np.where(mask, out[:, 0], -1), ref)


def test_unaligned_shape_padding(rng):
    # 50x70 needs padding to 56x128 — results must match the XLA path after
    # the label remap to the unpadded row-major space is applied by cc.py
    mask = rng.random((3, 50, 70)) < 0.3
    state0, fg = _seed_state(mask)
    out = np.asarray(cc_pallas.propagate(state0, fg, pool_iters=4,
                                         max_iters=64))
    for i in range(3):
        l = np.asarray(_cc._cc_bbox_single(jnp.asarray(mask[i]), 64)[0])
        assert np.array_equal(np.where(mask[i], out[i, 0], -1), l)


def test_filter_components_pallas_path_matches(rng, monkeypatch):
    """End-to-end: filter_components_by_geometry routed through the Pallas
    kernel (force mode -> interpret on CPU) equals the XLA path."""
    mask = (rng.random((4, 64, 128)) < 0.2)
    mask[1, 20:30, 40:80] = True
    args = dict(min_area=5, max_area=200, max_aspect=6.0, min_w=2, min_h=2,
                strict_min_wh=True)
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "0")
    ref = np.asarray(_cc.filter_components_by_geometry(jnp.asarray(mask), **args))
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "force")
    out = np.asarray(_cc.filter_components_by_geometry(jnp.asarray(mask), **args))
    assert np.array_equal(out, ref)


def test_filter_components_pallas_under_sharding(rng, monkeypatch):
    """The Pallas routing must compose with sharded inputs (the multichip
    deploy path): GSPMD treats the pallas_call as an opaque replicated
    computation, so results must stay bit-equal to the unsharded XLA path.
    Guards against the kernel silently breaking the spatially-sharded
    pipeline before any real pod run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mask = rng.random((4, 64, 96)) < 0.25
    mask[1, 20:40, 10:70] = True
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "spatial"))
    sharded = jax.device_put(
        jnp.asarray(mask), NamedSharding(mesh, P("data", "spatial", None)))
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "force")
    out = np.asarray(jax.jit(
        lambda x: _cc.filter_components_by_geometry(x, 10, 5000))(sharded))
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "0")
    ref = np.asarray(_cc.filter_components_by_geometry(
        jnp.asarray(mask), 10, 5000))
    assert np.array_equal(out, ref)


def test_connected_components_pallas_path_matches(rng, monkeypatch):
    mask = (rng.random((2, 40, 60)) < 0.3)
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "0")
    ref = np.asarray(_cc.connected_components(jnp.asarray(mask)))
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "force")
    out = np.asarray(_cc.connected_components(jnp.asarray(mask)))
    assert np.array_equal(out, ref)


def test_pallas_opt_out_spellings(monkeypatch):
    """Plausible disable spellings all force the XLA path (an operator
    setting UNET_TPU_CC_PALLAS=false for an A/B must actually get XLA)."""
    for off in ("0", "false", "OFF", "no", " False "):
        monkeypatch.setenv("UNET_TPU_CC_PALLAS", off)
        assert _cc._pallas_ok(5, 64, 64) is False
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "FORCE")
    assert _cc._pallas_ok(5, 64, 64) is True


def test_hysteresis_pallas_path_matches(rng, monkeypatch):
    """Canny hysteresis routed through the Pallas kernel (or-reachability as
    min-propagation with strong=0/weak=1 seeds) is bit-equal to the XLA
    while_loop path, including a serpentine weak chain that needs many
    propagation steps and strong-only / weak-only degenerate masks."""
    from unet_tpu.ops import edges as _edges

    H, W = 64, 128
    noise_strong = rng.random((2, H, W)) < 0.05
    noise_weak = np.logical_and(rng.random((2, H, W)) < 0.25,
                                np.logical_not(noise_strong))
    snake_weak = np.zeros((1, H, W), bool)       # weak chain lit by one seed
    snake_weak[0, 10:12, 5:100] = True
    snake_weak[0, 12:40, 98:100] = True
    snake_weak[0, 40:42, 20:100] = True
    snake_strong = np.zeros((1, H, W), bool)
    snake_strong[0, 10, 5] = True
    only_strong = np.zeros((1, H, W), bool)
    only_strong[0, 5:8, 5:50] = True
    cases = [
        (noise_strong, noise_weak),
        (snake_strong, snake_weak),
        (only_strong, np.zeros((1, H, W), bool)),          # no weak
        (np.zeros((1, H, W), bool), snake_weak),           # no strong -> all off
    ]
    for strong, weak in cases:
        monkeypatch.setenv("UNET_TPU_CC_PALLAS", "0")
        ref = np.asarray(_edges.hysteresis(jnp.asarray(strong),
                                           jnp.asarray(weak), cc_iters=64))
        monkeypatch.setenv("UNET_TPU_CC_PALLAS", "force")
        out = np.asarray(_edges.hysteresis(jnp.asarray(strong),
                                           jnp.asarray(weak), cc_iters=64))
        assert np.array_equal(out, ref)


def test_canny_pallas_path_matches(rng, monkeypatch):
    """Full canny (gradients + NMS + hysteresis) with the Pallas routing is
    bit-equal to the XLA path on textured content."""
    from unet_tpu.ops import edges as _edges

    img = (rng.random((2, 56, 72)) * 255).astype(np.float32)
    img[:, 20:36, 10:60] += 90.0
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "0")
    ref = np.asarray(_edges.canny(jnp.asarray(img), 50.0, 150.0))
    monkeypatch.setenv("UNET_TPU_CC_PALLAS", "force")
    out = np.asarray(_edges.canny(jnp.asarray(img), 50.0, 150.0))
    assert np.array_equal(out, ref)
