"""CLAHE + geometry parity vs OpenCV / reference-semantics numpy goldens."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import clahe as cl
from unet_tpu.ops import geometry as geo


@pytest.mark.parametrize("shape", [(93, 121), (64, 64), (96, 128)])
@pytest.mark.parametrize("clip,grid", [(3.0, (8, 8)), (2.0, (4, 4))])
def test_clahe_parity(rng, shape, clip, grid):
    g = (rng.random(shape) * 255).astype(np.uint8)
    want = cv2.createCLAHE(clipLimit=clip, tileGridSize=grid).apply(g)
    got = np.asarray(cl.clahe(jnp.asarray(g), clip, grid)).astype(np.uint8)
    diff = np.abs(want.astype(int) - got.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


def _width_loop(mask):
    H = mask.shape[0]
    w = np.zeros(H, np.float32)
    for y in range(H):
        xs = np.nonzero(mask[y])[0]
        if xs.size:
            w[y] = xs.max() - xs.min() + 1
    return w


def test_width_per_row(cable_scene):
    _, mask = cable_scene
    cable = (mask == 1).astype(np.uint8)
    want = _width_loop(cable)
    got = np.asarray(geo.width_per_row(jnp.asarray(cable)))
    assert np.array_equal(got, want)


def test_smooth_widths_matches_cv2(rng):
    w = (rng.random(96) * 50).astype(np.float32)
    want = cv2.GaussianBlur(w.reshape(-1, 1), (1, 31), 0).reshape(-1)
    got = np.asarray(geo.smooth_widths(jnp.asarray(w), 31))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_masked_median(rng):
    x = rng.random(50).astype(np.float32)
    valid = rng.random(50) > 0.4
    want = np.median(x[valid])
    got = float(geo.masked_median(jnp.asarray(x), jnp.asarray(valid)))
    assert abs(got - want) < 1e-6
    assert float(geo.masked_median(jnp.asarray(x), jnp.zeros(50, bool))) == 0.0


def _golden_diameter_metrics(pred, cable_cls=1, tape_cls=2, mm_per_px=0.05,
                             min_valid_rows=20):
    """Reference-semantics golden (geometry_enhanced.py:113-185) built from
    cv2 primitives."""
    def largest(m, min_area):
        n, lab, st, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
        if n <= 1:
            return m
        areas = st[1:, cv2.CC_STAT_AREA]
        ok = np.nonzero(areas >= min_area)[0]
        if not len(ok):
            return np.zeros_like(m)
        return (lab == 1 + ok[np.argmax(areas[ok])]).astype(np.uint8)

    cable = largest((pred == cable_cls).astype(np.uint8), 50)
    tape = largest((pred == tape_cls).astype(np.uint8), 50)
    wc = cv2.GaussianBlur(_width_loop(cable).reshape(-1, 1), (1, 31), 0).reshape(-1)
    wt = cv2.GaussianBlur(_width_loop(tape).reshape(-1, 1), (1, 31), 0).reshape(-1)
    valid = (wc > 0) & (wt > 0)
    if valid.sum() < min_valid_rows:
        return 0.0, 0.0, int(valid.sum())
    return float(np.median(wc[valid])), float(np.median(wt[valid])), int(valid.sum())


def test_diameter_metrics_parity(cable_scene):
    _, mask = cable_scene
    dc, dt, nvalid = _golden_diameter_metrics(mask)
    got = geo.diameter_metrics(jnp.asarray(mask))
    assert int(got.valid_rows) == nvalid
    assert abs(float(got.dc_px) - dc) < 1e-3
    assert abs(float(got.dt_px) - dt) < 1e-3
    assert abs(float(got.delta_d_px) - (dt - dc)) < 1e-3


def test_diameter_metrics_empty():
    got = geo.diameter_metrics(jnp.zeros((64, 64), jnp.int32))
    assert float(got.dc_px) == 0.0 and float(got.dt_px) == 0.0
    assert int(got.valid_rows) == 0


def test_analyze_defects(cable_scene):
    _, mask = cable_scene
    # punch holes into the tape
    m = mask.copy()
    m[40:44, 52:56] = 0
    m[55:58, 60:63] = 0
    got = geo.analyze_defects(jnp.asarray(m))
    # golden: close-diff holes
    tape = (m == 2).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    closed = cv2.morphologyEx(tape, cv2.MORPH_CLOSE, k)
    holes = ((closed.astype(np.int16) - tape.astype(np.int16)) > 0).astype(np.uint8)
    nh, _, hst, _ = cv2.connectedComponentsWithStats(holes, connectivity=8)
    areas = [a for a in (hst[1:, cv2.CC_STAT_AREA] if nh > 1 else []) if a >= 10]
    assert int(got.tape_num_holes) == len(areas)
    assert abs(float(got.tape_hole_ratio) - sum(areas) / max(tape.sum(), 1)) < 1e-6
    ncc_cable = cv2.connectedComponents((m == 1).astype(np.uint8))[0] - 1
    assert int(got.cable_num_components) == ncc_cable


def test_thickness_profile(cable_scene):
    _, mask = cable_scene
    prof = geo.thickness_profile(jnp.asarray(mask))
    wc = cv2.GaussianBlur(_width_loop((mask == 1).astype(np.uint8)).reshape(-1, 1), (1, 31), 0).reshape(-1)
    wt = cv2.GaussianBlur(_width_loop((mask == 2).astype(np.uint8)).reshape(-1, 1), (1, 31), 0).reshape(-1)
    np.testing.assert_allclose(np.asarray(prof.delta_d_mm), (wt - wc) * 0.05, atol=1e-4)
    assert np.array_equal(np.asarray(prof.valid), (wc > 0) & (wt > 0))
