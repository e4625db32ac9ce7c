"""Connected-component labeling + statistics on device (fixed shapes).

Every rule stage of the reference pipeline leans on
cv2.connectedComponentsWithStats on host:
  * burr candidate filtering by area/aspect/size
    (reference infer_two_stage_burr.py:100-119, infer_enhanced_burr.py:118-138)
  * cable component selection by shape score (reference src/refactor/postprocess.py:28-76)
  * tape largest-component constraint (reference src/refactor/postprocess.py:104-118)
  * largest-CC denoise before diameter profiles (reference src/utils/geometry.py:40-48,
    src/utils/geometry_enhanced.py:85-110)

TPU has no native CCL, and per-component Python loops are unjittable, so this
module re-expresses the whole thing as fixed-shape data-parallel passes:

  1. `connected_components` — label propagation: each foreground pixel
     carries the minimum linear index of its component. One iteration =
     several 3x3 min-pools (reduce_window — near-free on TPU) for short and
     diagonal hops, then segmented min-scans along rows and columns that
     propagate through whole straight runs at once (cable/tape/edge blobs are
     mostly straight). A while_loop runs until fixpoint with a `max_iters`
     safety bound. Deliberately NO scatter/gather in the loop: measured on
     v5e, a 358k-element 1-D scatter/gather costs ~25 ms while a
     reduce_window costs ~0.1 ms.
  2. `component_stats` — per-root area/bbox/centroid via scatter reductions
     into an (H*W+1)-bin table, then top-K by area — the fixed-shape stand-in
     for cv2's variable-length stats matrix.
  3. `keep_mask` / `component_any` — map per-component verdicts back to pixel
     masks with one scatter + one gather (replaces `labels == i` loops).

All functions take (..., H, W) and are vmapped over leading batch dims.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _batched(fn, x, *rest):
    """Apply fn over leading dims of x (last two are spatial)."""
    lead = x.shape[:-2]
    if not lead:
        return fn(x, *rest)
    xb = x.reshape((-1,) + x.shape[-2:])
    restb = [r.reshape((-1,) + r.shape[len(lead):]) for r in rest]
    out = jax.vmap(fn)(xb, *restb)
    return jax.tree.map(lambda o: o.reshape(lead + o.shape[1:]), out)


def _pallas_ok(c: int, h: int, w: int) -> bool:
    """Use the single-launch Pallas propagation kernel (ops/cc_pallas.py)?
    On TPU the XLA while_loop body issues ~50 kernels per iteration and the
    per-launch floor dominates (docs/PERF.md §1); the Pallas kernel runs the
    whole fixpoint in one launch. CPU (tests) keeps the XLA path.
    UNET_TPU_CC_PALLAS=0 forces the XLA path everywhere."""
    import os
    mode = os.environ.get("UNET_TPU_CC_PALLAS", "1").strip().lower()
    if mode in ("0", "false", "off", "no"):
        return False
    if mode != "force":  # "force" = pallas even off-TPU (interpret mode, tests)
        try:
            if jax.default_backend() != "tpu":
                return False
        except Exception:  # pragma: no cover - backend probing never raises
            return False
    from unet_tpu.ops import cc_pallas
    return cc_pallas.supported(c, h, w)


def _shift_axis(x: jnp.ndarray, d: int, axis: int, fill) -> jnp.ndarray:
    """out[i] = x[i - d] along `axis` (static d, either sign); OOB = fill."""
    n = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(d)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if d > 0:
        return jnp.concatenate(
            [pad, jax.lax.slice_in_dim(x, 0, n - d, axis=axis)], axis=axis)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, -d, n, axis=axis), pad], axis=axis)


def make_run_scanner(fg: jnp.ndarray, axis: int, op=jnp.minimum,
                     fill=np.iinfo(np.int32).max):
    """Build a segmented-`op` run scan over contiguous fg runs along `axis`.

    Returns scan(v) -> per-pixel `op`-reduction over the pixel's whole fg run
    (both directions fused). The Kogge-Stone "blocked" ladders
    b_k(i) = any background in (i-2^k, i] depend only on `fg`, so they are
    precomputed ONCE here and shared across every value channel, both scan
    directions, and every while_loop iteration — the associative_scan pair
    formulation re-derives them per channel per direction per iteration,
    which made the scans the hot spot of CC labeling (measured v5e: a 5-ch
    (448,512)x8 pair scan cost ~44 ms vs ~4 ms for a 3x3 min-pool).

    `v` may carry leading channel dims; `fg` is broadcast against it.
    """
    steps = []  # (distance, blocked_fwd, blocked_rev)
    b_f = jnp.logical_not(fg)
    b_r = b_f
    d = 1
    n = fg.shape[axis]
    while d < n:
        steps.append((d, b_f, b_r))
        b_f = jnp.logical_or(b_f, _shift_axis(b_f, d, axis, True))
        b_r = jnp.logical_or(b_r, _shift_axis(b_r, -d, axis, True))
        d *= 2

    # value arrays may have extra leading channel dims: shift axis offset
    def scan(v: jnp.ndarray) -> jnp.ndarray:
        off = v.ndim - fg.ndim
        a = axis + off
        masked = jnp.where(fg, v, fill)
        f = masked
        r = masked
        for d, b_f, b_r in steps:
            f = jnp.where(b_f, f, op(f, _shift_axis(f, d, a, fill)))
            r = jnp.where(b_r, r, op(r, _shift_axis(r, -d, a, fill)))
        return jnp.where(fg, op(f, r), v)

    return scan


def _row_scan_min(val: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Segmented min over contiguous fg runs along `axis` (both directions).
    One-shot convenience wrapper over make_run_scanner (use the scanner
    directly inside loops so the blocked ladders are hoisted)."""
    return make_run_scanner(fg, axis)(val)


def _min_pool(lab2d: jnp.ndarray, fg: jnp.ndarray, connectivity: int,
              inf: jnp.ndarray) -> jnp.ndarray:
    """One step of 8-/4-neighbour label min propagation via reduce_window
    (TPU-native: a reduce_window is ~free vs scatter/gather)."""
    masked = jnp.where(fg, lab2d, inf)
    neg = -masked
    if connectivity == 8:
        out = -jax.lax.reduce_window(neg, -inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    else:
        a = -jax.lax.reduce_window(neg, -inf, jax.lax.max, (3, 1), (1, 1), "SAME")
        b = -jax.lax.reduce_window(neg, -inf, jax.lax.max, (1, 3), (1, 1), "SAME")
        out = jnp.minimum(a, b)
    return jnp.where(fg, jnp.minimum(out, masked), lab2d)


def _label_seed(h: int, w: int) -> jnp.ndarray:
    """Label-channel seed: the row-major linear index idx[r, c] = r*w + c.
    Shared by the XLA and Pallas routes (the parity contract is that both
    propagate identical seeds to the identical fixpoint)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))


def _bbox_seed_state(fg: jnp.ndarray, with_rank: bool) -> jnp.ndarray:
    """Seed channels for the fused label/bbox(/rank) propagation: label
    (row-major linear index), -max_r, min_c, -max_c — all segment MINIMA —
    plus, when with_rank, the run-head-rank cumsum channel (see
    _cc_bbox_single's docstring for why the cumsum min is a compact id).

    fg: (..., H, W) bool. Returns (..., C, H, W) int32 with C = 4 or 5.
    Single source of truth for seed construction: the XLA and Pallas routes
    both consume this, so their bit-exact parity cannot drift."""
    H, W = fg.shape[-2:]
    lead = fg.shape[:-2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    chans = [jnp.broadcast_to(rows * W + cols, lead + (H, W)),
             jnp.broadcast_to(-rows, lead + (H, W)),
             jnp.broadcast_to(cols, lead + (H, W)),
             jnp.broadcast_to(-cols, lead + (H, W))]
    if with_rank:
        def rank_one(f):
            return jnp.cumsum(
                _run_heads(f).reshape(-1).astype(jnp.int32)).reshape(H, W)
        if lead:
            rank = jax.vmap(rank_one)(fg.reshape((-1, H, W)))
            chans.append(rank.reshape(lead + (H, W)))
        else:
            chans.append(rank_one(fg))
    return jnp.stack(chans, axis=-3)


def _cc_single(mask: jnp.ndarray, connectivity: int, max_iters: int,
               pool_iters: int = 16) -> jnp.ndarray:
    """Label propagation tuned to the TPU cost model: each outer iteration is
    `pool_iters` cheap 3x3 min-pools (short/diagonal hops) followed by
    segmented min-scans along rows and columns (whole straight runs at once).
    No scatter/gather — those are ~1000x costlier than reduce_window here.
    Measured (v5e): one extra fused min-pool costs ~0.1 ms while a scan pair
    costs ~10-40 ms, so iterations are pool-heavy to cross snaking contours
    with as few scan passes as possible. Converges in a few outer iterations
    for blob/edge masks; `max_iters` bounds pathological shapes (spirals)."""
    H, W = mask.shape
    fg = mask.astype(jnp.bool_)
    inf = jnp.int32(np.iinfo(np.int32).max)
    lab = _label_seed(H, W)
    scan_c = make_run_scanner(fg, axis=1)  # blocked ladders hoisted out of loop
    scan_r = make_run_scanner(fg, axis=0)

    def body(state):
        lab, _, i = state
        m = lab
        for _ in range(pool_iters):
            m = _min_pool(m, fg, connectivity, inf)
        m = scan_c(m)
        m = scan_r(m)
        return m, jnp.any(m != lab), i + 1

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(fg, lab, jnp.int32(-1))


def connected_components(mask: jnp.ndarray, connectivity: int = 8,
                         max_iters: int = 64) -> jnp.ndarray:
    """Label (..., H, W) foreground masks: each fg pixel gets the minimum
    linear index (r*W + c) of its component; background gets -1.

    Label *values* differ from cv2's 1..N compaction but partition pixels
    identically (verified against cv2.connectedComponents in tests).
    """
    H, W = mask.shape[-2:]
    if _pallas_ok(1, H, W):
        from unet_tpu.ops import cc_pallas
        lead = mask.shape[:-2]
        fg = mask.reshape((-1, H, W)).astype(jnp.bool_)
        state0 = jnp.broadcast_to(_label_seed(H, W)[None, None],
                                  (fg.shape[0], 1, H, W))
        out = cc_pallas.propagate(state0, fg, pool_iters=16,
                                  max_iters=max_iters,
                                  connectivity=connectivity)
        lab = jnp.where(fg, out[:, 0], jnp.int32(-1))
        return lab.reshape(lead + (H, W))
    return _batched(lambda m: _cc_single(m, connectivity, max_iters), mask)


class ComponentStats(NamedTuple):
    """Fixed-size (top-K by area) analogue of cv2.connectedComponentsWithStats.

    Fields are (..., K) arrays; `valid` marks real components (area > 0).
    bbox fields follow cv2 CC_STAT_* semantics: left/top inclusive origin,
    width/height in pixels. `cx`/`cy` are float centroids.
    """
    label: jnp.ndarray   # root linear index of the component
    area: jnp.ndarray    # pixel count
    left: jnp.ndarray
    top: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    valid: jnp.ndarray   # bool
    num: jnp.ndarray     # scalar per batch element: number of valid comps


def _stats_single(labels: jnp.ndarray, k: int) -> ComponentStats:
    H, W = labels.shape
    hw = H * W
    labf = labels.reshape(-1)
    fg = labf >= 0
    bins = jnp.where(fg, labf, hw)  # background to overflow bin

    rows = (jnp.arange(hw, dtype=jnp.int32) // W)
    cols = (jnp.arange(hw, dtype=jnp.int32) % W)
    big = jnp.int32(np.iinfo(np.int32).max)

    area = jnp.zeros(hw + 1, jnp.int32).at[bins].add(jnp.where(fg, 1, 0))
    area = area.at[hw].set(0)
    min_r = jnp.full(hw + 1, big, jnp.int32).at[bins].min(jnp.where(fg, rows, big))
    max_r = jnp.full(hw + 1, -1, jnp.int32).at[bins].max(jnp.where(fg, rows, -1))
    min_c = jnp.full(hw + 1, big, jnp.int32).at[bins].min(jnp.where(fg, cols, big))
    max_c = jnp.full(hw + 1, -1, jnp.int32).at[bins].max(jnp.where(fg, cols, -1))
    sum_r = jnp.zeros(hw + 1, jnp.float32).at[bins].add(jnp.where(fg, rows, 0).astype(jnp.float32))
    sum_c = jnp.zeros(hw + 1, jnp.float32).at[bins].add(jnp.where(fg, cols, 0).astype(jnp.float32))

    top_area, top_lab = jax.lax.top_k(area[:hw], k)
    valid = top_area > 0
    af = jnp.maximum(top_area, 1).astype(jnp.float32)
    return ComponentStats(
        label=jnp.where(valid, top_lab, -1),
        area=top_area,
        left=jnp.where(valid, min_c[top_lab], 0),
        top=jnp.where(valid, min_r[top_lab], 0),
        width=jnp.where(valid, max_c[top_lab] - min_c[top_lab] + 1, 0),
        height=jnp.where(valid, max_r[top_lab] - min_r[top_lab] + 1, 0),
        cx=jnp.where(valid, sum_c[top_lab] / af, 0.0),
        cy=jnp.where(valid, sum_r[top_lab] / af, 0.0),
        valid=valid,
        num=jnp.sum(valid.astype(jnp.int32)),
    )


def component_stats(labels: jnp.ndarray, max_components: int = 32) -> ComponentStats:
    """Top-`max_components` (by area) component statistics of a label map."""
    return _batched(lambda l: _stats_single(l, max_components), labels)


def _keep_single(labels: jnp.ndarray, comp_label: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    H, W = labels.shape
    hw = H * W
    flag = jnp.zeros(hw + 1, jnp.bool_)
    tgt = jnp.where(comp_label >= 0, comp_label, hw)
    flag = flag.at[tgt].max(keep)
    flag = flag.at[hw].set(False)
    labf = labels.reshape(-1)
    return flag[jnp.where(labf >= 0, labf, hw)].reshape(H, W)


def keep_mask(labels: jnp.ndarray, stats: ComponentStats, keep: jnp.ndarray) -> jnp.ndarray:
    """Pixel mask of components whose per-component `keep` flag is set.

    Replaces the reference's `for i in range(1, num_labels): if ok:
    out[labels == i] = 1` loops with one scatter + one gather.
    """
    return _batched(_keep_single, labels, stats.label, jnp.logical_and(keep, stats.valid))


def _any_single(labels: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    H, W = labels.shape
    hw = H * W
    labf = labels.reshape(-1)
    bins = jnp.where(labf >= 0, labf, hw)
    acc = jnp.zeros(hw + 1, jnp.bool_).at[bins].max(flags.reshape(-1))
    acc = acc.at[hw].set(False)
    return acc[bins].reshape(H, W)


def component_any(labels: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """True at every pixel whose component contains any `flags` pixel
    (the hysteresis primitive of ops.edges)."""
    return _batched(_any_single, labels, flags)


def largest_component(mask: jnp.ndarray, min_area: int = 0, connectivity: int = 8,
                      max_iters: int = 64) -> jnp.ndarray:
    """Largest connected component of a binary mask; all-zero if the largest
    is smaller than `min_area` (reference src/utils/geometry_enhanced.py:85-110;
    with min_area=0 also matches src/utils/geometry.py:40-48 whose 'unchanged'
    fallback only triggers on already-empty masks)."""
    labels = connected_components(mask, connectivity, max_iters)
    stats = component_stats(labels, max_components=1)

    def single(lab, comp_label, area):
        keep = area >= max(min_area, 1)
        return _keep_single(lab, comp_label, keep)

    return _batched(single, labels, stats.label, stats.area)


def _run_heads(fg: jnp.ndarray) -> jnp.ndarray:
    """First pixel of every horizontal fg run (fg & not fg-to-the-left)."""
    left = jnp.concatenate(
        [jnp.zeros((fg.shape[0], 1), jnp.bool_), fg[:, :-1]], axis=1)
    return jnp.logical_and(fg, jnp.logical_not(left))


def _cc_bbox_single(mask: jnp.ndarray, max_iters: int, pool_iters: int = 4,
                    with_rank: bool = False):
    """Fused labels + per-pixel component bbox. The propagated quantities
    (label, max_r, min_c, max_c) are segment-associative MINIMA after
    negating the two maxima, so each propagation pass is ONE stacked
    (C, H, W) min-pool / segmented min-scan instead of separate calls —
    scans are pass-dominated, and this is the burr filter's hot loop.
    min_r needs no channel of its own: the root label is the component's
    minimum row-major linear index, so min_r = label // W. Every foreground
    pixel ends up knowing its component's bounding box without any
    per-component scatter.

    with_rank adds a 5th channel carrying the component's run-head rank:
    seed every pixel with the inclusive row-major cumsum of the run-head
    indicator. The cumsum is nondecreasing in linear order and the root IS
    a run head (leftmost pixel of the component's topmost run), so the
    min over the component equals the rank of the root's run head — a
    dense compact component id in [1, #run_heads] obtained WITHOUT any
    gather/scatter (docs/PERF.md: 1-D gathers cost ~30 ms per 3.7M
    elements on this path; this channel costs one cumsum + 25 % on the
    propagation)."""
    H, W = mask.shape
    fg = mask.astype(jnp.bool_)
    big = jnp.int32(np.iinfo(np.int32).max)
    # channels: label, -max_r, min_c, -max_c (all propagate as min) + rank
    state0 = _bbox_seed_state(fg, with_rank)
    C = state0.shape[0]
    fgC = jnp.broadcast_to(fg, (C, H, W))
    scan_c = make_run_scanner(fg, axis=1)  # ladders shared by all channels
    scan_r = make_run_scanner(fg, axis=0)  # and hoisted out of the loop

    def min_pool(v):
        masked = jnp.where(fgC, v, big)
        out = -jax.lax.reduce_window(-masked, -big, jax.lax.max,
                                     (1, 3, 3), (1, 1, 1), "SAME")
        return jnp.where(fgC, jnp.minimum(out, masked), v)

    def body(carry):
        s, _, i = carry
        m = s
        for _ in range(pool_iters):
            m = min_pool(m)
        m = scan_c(m)
        m = scan_r(m)
        return m, jnp.any(m != s), i + 1

    def cond(carry):
        _, changed, i = carry
        return jnp.logical_and(changed, i < max_iters)

    s, _, _ = jax.lax.while_loop(cond, body,
                                 (state0, jnp.bool_(True), jnp.int32(0)))
    labels = jnp.where(fg, s[0], -1)
    min_r = jnp.where(fg, s[0] // W, 0)
    rank = s[4] if with_rank else None
    return labels, min_r, -s[1], s[2], -s[3], rank


def _cc_bbox_batched(mb: jnp.ndarray, max_iters: int, with_rank: bool):
    """Batched fused label/bbox(/rank) propagation: one Pallas launch on TPU
    (ops/cc_pallas.py), vmapped XLA while_loop elsewhere. Returns
    (labels, min_r, max_r, min_c, max_c, rank) with _cc_bbox_single's exact
    semantics; rank is None when with_rank is False."""
    B, H, W = mb.shape
    C = 5 if with_rank else 4
    if _pallas_ok(C, H, W):
        from unet_tpu.ops import cc_pallas
        fg = mb.astype(jnp.bool_)
        state0 = _bbox_seed_state(fg, with_rank)
        s = cc_pallas.propagate(state0, fg, pool_iters=4, max_iters=max_iters)
        labels = jnp.where(fg, s[:, 0], jnp.int32(-1))
        min_r = jnp.where(fg, s[:, 0] // W, 0)
        return (labels, min_r, -s[:, 1], s[:, 2], -s[:, 3],
                s[:, 4] if with_rank else None)
    return _batched(
        lambda m: _cc_bbox_single(m, max_iters, with_rank=with_rank), mb)


def filter_components_by_geometry(mask: jnp.ndarray, min_area: int, max_area: int,
                                  max_aspect: float = None, min_w: int = 0,
                                  min_h: int = 0, strict_min_wh: bool = False,
                                  max_iters: int = 64,
                                  onehot_max_components: int = 4096) -> jnp.ndarray:
    """Keep pixels whose component satisfies the reference's CC area/aspect/
    size gates (infer_two_stage_burr.py:100-119) — the fast path for the burr
    filter: fused bbox propagation plus an MXU-shaped area gate.

    Three regimes, picked by whole-batch lax.cond (measured v5e, b16 crops):
      * empty candidates (the common production case — the reference video
        has zero burr frames): skip everything, ~3 ms.
      * <= onehot_max_components run heads per image: area gating via exact
        factorized one-hot matmuls (component id = hi*64+lo) over the compact
        run-head-rank id carried by the propagation — per-component counts
        accumulate in f32 (exact below 2^24) and the keep flag maps back as
        0/1 table lookups (exact in bf16), so no 3.7M-element scatter or
        gather runs and no operand wider than 64 lanes (measured numbers
        in docs/PERF.md §3d).
      * pathological masks (more run heads): the scatter+gather fallback,
        bit-identical semantics.
    """
    def keep_from_bbox(m, mnr, mxr, mnc, mxc):
        width = mxc - mnc + 1
        height = mxr - mnr + 1
        keep = jnp.ones(m.shape, jnp.bool_)
        if max_aspect is not None:
            aspect = (jnp.maximum(width, height).astype(jnp.float32)
                      / (jnp.minimum(width, height).astype(jnp.float32) + 1e-6))
            keep = jnp.logical_and(keep, aspect < max_aspect)
        if strict_min_wh:
            keep = jnp.logical_and(keep, jnp.logical_and(width >= min_w,
                                                         height >= min_h))
        else:
            keep = jnp.logical_and(keep, jnp.logical_and(width > min_w,
                                                         height > min_h))
        return keep

    def single_scatter(m, labels):
        H, W = m.shape
        hw = H * W
        labf = labels.reshape(-1)
        fgf = labf >= 0
        bins = jnp.where(fgf, labf, hw)
        areas = jnp.zeros(hw + 1, jnp.int32).at[bins].add(jnp.where(fgf, 1, 0))
        area_px = areas[bins].reshape(H, W)
        return jnp.logical_and(area_px >= min_area, area_px <= max_area)

    def single_onehot(m, labels, rank):
        # Factorized two-level histogram: component id = hi*64 + lo, so the
        # K-wide one-hot becomes two (H*W, 64)-ish one-hots and the
        # per-component pixel count is ONE MXU matmul
        #   hist[hi, lo] = sum_p oh_hi[p,hi] * oh_lo[p,lo]
        # (bf16 0/1 operands, f32 accumulation -> exact below 2^24). The
        # keep flag maps back as ok-table lookups through the same factors.
        # vs the flat (H*W, K) formulation this cuts operand bytes 64x — the
        # flat one-hot measured ~26 ms/b16 at 448x512/K=4096 on v5e (VPU
        # fusion-bound, docs/PERF.md §3d) — and removes the materialization
        # risk entirely (max operand is H*W x 64 bf16). Escape hatch:
        # UNET_TPU_CC_NO_ONEHOT=1 forces the scatter path (bit-identical
        # semantics).
        H, W = m.shape
        K = ((onehot_max_components + 63) // 64) * 64  # pad to the lane width
        comp = jnp.where(labels >= 0, rank, K).reshape(-1)
        # bg comp==K -> hi==K//64 is out of range -> all-zero oh_hi row
        oh_hi = jax.nn.one_hot(comp // 64, K // 64, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(comp % 64, 64, dtype=jnp.bfloat16)
        hist = jnp.einsum("ph,pl->hl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32)
        ok = jnp.logical_and(hist >= min_area, hist <= max_area)
        # keep[p] = ok[hi_p, lo_p]; t[p,l] = ok[hi_p, l] is 0/1, bf16-exact
        t = jnp.einsum("ph,hl->pl", oh_hi, ok.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        keep_area = jnp.sum(t * oh_lo, axis=-1)
        return (keep_area > 0.5).reshape(H, W)

    def run(m):
        # the expensive label/bbox/rank propagation runs ONCE per batch
        # (single Pallas launch on TPU, XLA while_loop elsewhere) and is
        # shared by both area-gating regimes below
        import os
        # same truthiness convention as UNET_TPU_CC_PALLAS: '0'/'false'/
        # 'off'/'no'/'' mean NOT set (keep the one-hot path)
        use_onehot = (os.environ.get("UNET_TPU_CC_NO_ONEHOT", "")
                      .strip().lower() in ("", "0", "false", "off", "no"))
        lead = m.shape[:-2]
        mb = m.reshape((-1,) + m.shape[-2:])
        labels, mnr, mxr, mnc, mxc, rank = _cc_bbox_batched(
            mb, max_iters, with_rank=use_onehot)
        bbox_keep = keep_from_bbox(mb, mnr, mxr, mnc, mxc)
        if not use_onehot:
            area_keep = jax.vmap(single_scatter)(mb, labels)
        else:
            heads = jax.vmap(lambda mm: jnp.sum(_run_heads(
                mm.astype(jnp.bool_)).astype(jnp.int32)))(mb)
            area_keep = jax.lax.cond(
                jnp.max(heads) < onehot_max_components,
                lambda x: jax.vmap(single_onehot)(*x),
                lambda x: jax.vmap(single_scatter)(x[0], x[1]),
                (mb, labels, rank))
        keep = jnp.logical_and(jnp.logical_and(bbox_keep, area_keep),
                               mb.astype(jnp.bool_))
        return keep.reshape(lead + m.shape[-2:])

    return jax.lax.cond(jnp.any(mask), run,
                        lambda m: jnp.zeros(m.shape, jnp.bool_),
                        mask)


def count_components(mask: jnp.ndarray, connectivity: int = 8,
                     max_components: int = 64, max_iters: int = 64) -> jnp.ndarray:
    """Number of connected components (excluding background), clipped at
    `max_components` (reference src/utils/geometry_enhanced.py:297-306)."""
    labels = connected_components(mask, connectivity, max_iters)
    return component_stats(labels, max_components).num
