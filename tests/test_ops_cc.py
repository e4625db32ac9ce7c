"""Connected-component labeling/stats parity vs cv2 (the reference's
per-component filter loops, e.g. infer_two_stage_burr.py:100-119)."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import cc


def _canon(lab, fg):
    ids, out = {}, np.full(lab.shape, -1)
    for r, c in zip(*np.nonzero(fg)):
        v = lab[r, c]
        out[r, c] = ids.setdefault(v, len(ids))
    return out


def _scene(kind, rng):
    m = np.zeros((64, 80), np.uint8)
    if kind == "blobs":
        cv2.circle(m, (20, 20), 8, 1, -1)
        cv2.circle(m, (60, 40), 5, 1, -1)
        cv2.line(m, (5, 60), (75, 55), 1, 1)
    elif kind == "noise":
        m = (rng.random((64, 80)) > 0.8).astype(np.uint8)
    elif kind == "spiral":
        for i, r in enumerate(range(4, 30, 4)):
            cv2.ellipse(m, (40, 32), (r, r), 0, i * 40, i * 40 + 300, 1, 1)
    elif kind == "diag":
        cv2.line(m, (0, 0), (63, 63), 1, 1)
        cv2.line(m, (79, 0), (16, 63), 1, 1)
    return m


@pytest.mark.parametrize("kind", ["blobs", "noise", "spiral", "diag"])
@pytest.mark.parametrize("connectivity", [4, 8])
def test_partition_parity(rng, kind, connectivity):
    m = _scene(kind, rng)
    _, want = cv2.connectedComponents(m, connectivity=connectivity)
    got = np.asarray(cc.connected_components(jnp.asarray(m), connectivity, max_iters=32))
    assert np.array_equal(_canon(want, m > 0), _canon(got, m > 0))


def test_stats_parity(rng):
    m = _scene("blobs", rng) | (rng.random((64, 80)) > 0.985).astype(np.uint8)
    n, lab, st, cen = cv2.connectedComponentsWithStats(m, connectivity=8)
    assert n - 1 <= 128  # scene must fit in the fixed top-K budget
    stats = cc.component_stats(cc.connected_components(jnp.asarray(m)), 128)
    # match components by (area, bbox) multiset
    want = sorted((int(st[i, cv2.CC_STAT_AREA]), int(st[i, cv2.CC_STAT_LEFT]),
                   int(st[i, cv2.CC_STAT_TOP]), int(st[i, cv2.CC_STAT_WIDTH]),
                   int(st[i, cv2.CC_STAT_HEIGHT]), round(float(cen[i][0]), 4),
                   round(float(cen[i][1]), 4)) for i in range(1, n))
    got = sorted((int(a), int(l), int(t), int(w), int(h), round(float(cx), 4), round(float(cy), 4))
                 for a, l, t, w, h, cx, cy, v in zip(
                     np.asarray(stats.area), np.asarray(stats.left), np.asarray(stats.top),
                     np.asarray(stats.width), np.asarray(stats.height),
                     np.asarray(stats.cx), np.asarray(stats.cy), np.asarray(stats.valid)) if v)
    assert got == want
    assert int(stats.num) == n - 1


def test_area_filter_matches_reference_loop(rng):
    """Replicates the area/aspect/size CC filter of
    reference infer_two_stage_burr.py:100-119 against a direct cv2 loop."""
    m = (rng.random((64, 80)) > 0.85).astype(np.uint8)
    m = cv2.dilate(m, np.ones((2, 2), np.uint8))
    cfg = dict(min_area=10, max_area=200)
    n, lab, st, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    want = np.zeros_like(m)
    for i in range(1, n):
        a, w, h = st[i, cv2.CC_STAT_AREA], st[i, cv2.CC_STAT_WIDTH], st[i, cv2.CC_STAT_HEIGHT]
        aspect = max(w, h) / (min(w, h) + 1e-6)
        if cfg["min_area"] <= a <= cfg["max_area"] and aspect < 5.0 and w > 3 and h > 3:
            want[lab == i] = 1

    labels = cc.connected_components(jnp.asarray(m))
    stats = cc.component_stats(labels, 128)
    aspect = jnp.maximum(stats.width, stats.height) / (jnp.minimum(stats.width, stats.height) + 1e-6)
    keep = ((stats.area >= cfg["min_area"]) & (stats.area <= cfg["max_area"])
            & (aspect < 5.0) & (stats.width > 3) & (stats.height > 3))
    got = np.asarray(cc.keep_mask(labels, stats, keep)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_largest_component(rng):
    m = np.zeros((48, 64), np.uint8)
    cv2.circle(m, (15, 24), 10, 1, -1)   # big
    cv2.circle(m, (50, 10), 3, 1, -1)    # small
    got = np.asarray(cc.largest_component(jnp.asarray(m)))
    n, lab, st, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    want = lab == (1 + np.argmax(st[1:, cv2.CC_STAT_AREA]))
    assert np.array_equal(got, want)
    # min_area larger than biggest -> empty
    got2 = np.asarray(cc.largest_component(jnp.asarray(m), min_area=10 ** 6))
    assert got2.sum() == 0
    # empty input -> empty output
    assert np.asarray(cc.largest_component(jnp.zeros((8, 8), bool))).sum() == 0


def test_component_any(rng):
    m = np.zeros((32, 32), np.uint8)
    cv2.circle(m, (8, 8), 4, 1, -1)
    cv2.circle(m, (24, 24), 4, 1, -1)
    flags = np.zeros((32, 32), bool)
    flags[8, 8] = True  # only first blob flagged
    labels = cc.connected_components(jnp.asarray(m))
    got = np.asarray(cc.component_any(labels, jnp.asarray(flags)))
    n, lab = cv2.connectedComponents(m)
    want = lab == lab[8, 8]
    assert np.array_equal(got, want)


def test_batched(rng):
    ms = (rng.random((3, 32, 40)) > 0.8).astype(np.uint8)
    labs = np.asarray(cc.connected_components(jnp.asarray(ms)))
    for i in range(3):
        single = np.asarray(cc.connected_components(jnp.asarray(ms[i])))
        assert np.array_equal(labs[i], single)


def test_filter_components_by_geometry_parity(rng):
    """Fast fused-bbox filter path must match the cv2-loop golden exactly."""
    m = (rng.random((64, 80)) > 0.85).astype(np.uint8)
    m = cv2.dilate(m, np.ones((2, 2), np.uint8))
    n, lab, st, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    want = np.zeros_like(m)
    for i in range(1, n):
        a, w, h = st[i, cv2.CC_STAT_AREA], st[i, cv2.CC_STAT_WIDTH], st[i, cv2.CC_STAT_HEIGHT]
        aspect = max(w, h) / (min(w, h) + 1e-6)
        if 10 <= a <= 200 and aspect < 5.0 and w > 3 and h > 3:
            want[lab == i] = 1
    got = np.asarray(cc.filter_components_by_geometry(
        jnp.asarray(m), 10, 200, max_aspect=5.0, min_w=3, min_h=3)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_filter_components_area_only(rng):
    m = (rng.random((48, 64)) > 0.8).astype(np.uint8)
    n, lab, st, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    want = np.zeros_like(m)
    for i in range(1, n):
        if 3 <= st[i, cv2.CC_STAT_AREA] <= 50:
            want[lab == i] = 1
    got = np.asarray(cc.filter_components_by_geometry(jnp.asarray(m), 3, 50)).astype(np.uint8)
    assert np.array_equal(got, want)


def test_filter_components_batched(rng):
    ms = (rng.random((3, 32, 40)) > 0.8).astype(np.uint8)
    out = np.asarray(cc.filter_components_by_geometry(jnp.asarray(ms), 2, 30))
    for i in range(3):
        single = np.asarray(cc.filter_components_by_geometry(jnp.asarray(ms[i]), 2, 30))
        assert np.array_equal(out[i], single)


def test_make_run_scanner_min_vs_numpy(rng):
    """Segmented run-min (the Kogge-Stone ladder scan) vs an explicit numpy
    per-run reduction, including channel broadcasting as used by the fused
    bbox propagation."""
    fg = rng.random((23, 37)) > 0.4
    v = rng.integers(0, 1000, (4, 23, 37)).astype(np.int32)

    want = v.copy()
    for r in range(23):
        c = 0
        while c < 37:
            if not fg[r, c]:
                c += 1
                continue
            c2 = c
            while c2 < 37 and fg[r, c2]:
                c2 += 1
            want[:, r, c:c2] = v[:, r, c:c2].min(axis=-1, keepdims=True)
            c = c2

    scan = cc.make_run_scanner(jnp.asarray(fg), axis=1)
    got = np.asarray(scan(jnp.asarray(v)))
    assert np.array_equal(got, want)


def test_make_run_scanner_or_vs_numpy(rng):
    """Segmented run-or (the hysteresis primitive) vs explicit numpy,
    along both axes."""
    fg = rng.random((19, 31)) > 0.35
    v = np.logical_and(rng.random((19, 31)) > 0.8, fg)
    for axis in (0, 1):
        want = v.copy()
        moved_fg = fg if axis == 1 else fg.T
        moved_w = want if axis == 1 else want.T
        moved_v = v if axis == 1 else v.T
        for r in range(moved_fg.shape[0]):
            c = 0
            while c < moved_fg.shape[1]:
                if not moved_fg[r, c]:
                    c += 1
                    continue
                c2 = c
                while c2 < moved_fg.shape[1] and moved_fg[r, c2]:
                    c2 += 1
                moved_w[r, c:c2] = moved_v[r, c:c2].any()
                c = c2
        want = moved_w if axis == 1 else moved_w.T
        scan = cc.make_run_scanner(jnp.asarray(fg), axis=axis,
                                   op=jnp.logical_or, fill=False)
        got = np.asarray(scan(jnp.asarray(v)))
        assert np.array_equal(np.logical_and(got, fg), np.logical_and(want, fg))


def test_filter_onehot_and_scatter_branches_agree():
    """The compact one-hot area path and the scatter fallback are bit-equal;
    forcing a tiny onehot_max_components selects the fallback."""
    from unet_tpu.ops.cc import filter_components_by_geometry

    rng = np.random.default_rng(5)
    mask = np.zeros((2, 96, 128), bool)
    for i in range(2):
        for _ in range(12):
            r, c = rng.integers(0, 90), rng.integers(0, 120)
            mask[i, r:r + rng.integers(2, 9), c:c + rng.integers(2, 9)] = True
    a = np.asarray(filter_components_by_geometry(
        jnp.asarray(mask), 10, 60, max_aspect=5.0))
    b = np.asarray(filter_components_by_geometry(
        jnp.asarray(mask), 10, 60, max_aspect=5.0, onehot_max_components=1))
    assert np.array_equal(a, b)
    assert a.any() and not a.all()


def test_filter_empty_mask_early_exit():
    from unet_tpu.ops.cc import filter_components_by_geometry
    out = filter_components_by_geometry(jnp.zeros((3, 32, 32), bool), 1, 100)
    assert not np.asarray(out).any()


def test_bbox_propagation_converges_on_serpentine():
    """A serpentine strip needs many propagation rounds; the filter's raised
    max_iters bound must fully converge so the single component's area is
    exact (regression: truncation split it into fragments)."""
    from unet_tpu.ops.cc import filter_components_by_geometry

    s = np.zeros((64, 64), bool)
    s[::4, :] = True
    for r in range(0, 64, 8):
        s[r:r + 4, 0] = True
    for r in range(4, 64, 8):
        s[r:r + 4, -1] = True
    area = int(s.sum())
    kept = np.asarray(filter_components_by_geometry(
        jnp.asarray(s), area, area))   # exact-area gate: all or nothing
    assert np.array_equal(kept, s)
