"""Per-op breakdown of the two-stage pipeline's NON-conv time (VERDICT r4
weak #7 / next #2).

PERF.md §2b ends with: conv stack 1.475 ms/frame (architecture-bound),
non-conv 1.471 ms/frame — one aggregate with no attribution. This measures
the rule stack op by op at the OFFICIAL operating point (two_stage preset,
800x448 frames, batch 96, int8, chunked dispatch semantics): each stage is
timed standalone under a k-iteration lax.scan on the REAL intermediates a
pipeline run produces (CC/hysteresis convergence is content-dependent), with
a runtime-zero data-dependent bump so XLA cannot hoist the loop-invariant
body. Reported: ms/frame per op, the sum vs the fused full step (the gap is
XLA fusion + per-kernel launch floors), and each op's share.

Stage map (stages.run_pipeline with the two_stage cfg; reference loop
infer_two_stage_burr.py:269-377):
  pre+input   uint8->f32 + BGR->RGB + resize 512^2 + /255 (:275-292)
  forward     int8 packed NestedUNet (models/quantized.py)
  argmax      extract_masks (softmax-free argmax + class eq) (:299-300)
  mask_resize cable+tape nearest back to 448x800 (:303-308)
  roi_limit   zero outside fixed ROI x2 (:309-314)
  bgr2gray    gray frame for stage 2 (:317)
  burr_total  _burr_on_roi_crop: band+blur+canny+morph+CC on the ROI crop
              (detect_burrs_on_cable, :50-119), under the any-cable lax.cond
  classmap    class_map wheres + cable/tape/burr px sums (:329-348)

Run: python docs/experiments/profile_nonconv_ops.py [--batch 96] [--loops 20]
Recorded: docs/PERF.md §2c.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.ops import cc as _cc
    from unet_tpu.ops import color as _color
    from unet_tpu.ops import image as _image
    from unet_tpu.ops import morph as _morph
    from unet_tpu.ops import edges as _edges
    from unet_tpu.pipeline import stages

    enable_compilation_cache()
    B = args.batch
    H, W = bench.FRAME_H, bench.FRAME_W

    model, variables, _cfg, cfg_for = bench._build_pipeline(
        "two_stage", {}, (H, W))
    cfg = cfg_for(args.dtype)
    frames = jnp.asarray(bench._synthetic_frames(
        np.random.default_rng(0), B, h=H, w=W))

    k = args.loops

    def timed(fn, *op_args, reps=3):
        """ms per fn() call: k-iteration scan carrying op_args[0], with a
        runtime-zero (but data-dependent) bump of its first element so the
        body cannot be hoisted; best of `reps`."""
        x0, rest = op_args[0], op_args[1:]

        def run(x0):
            def body(carry, _):
                out = fn(carry, *rest)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(out))
                bump = s * 1e-30 > 1.0  # always False at runtime, unknown to XLA
                v = jax.lax.dynamic_slice(
                    carry, (0,) * carry.ndim, (1,) * carry.ndim)
                nv = (v ^ bump) if carry.dtype == jnp.bool_ \
                    else v + bump.astype(carry.dtype)
                return jax.lax.dynamic_update_slice(
                    carry, nv, (0,) * carry.ndim), s
            final, ss = jax.lax.scan(body, x0, None, length=k)
            return jnp.float32(ss[-1]) + jnp.float32(
                final.astype(jnp.float32).ravel()[0])

        f = jax.jit(run)
        _ = float(f(x0))  # compile
        best = min(_t(f, x0) for _ in range(reps))
        return best / k * 1000.0

    def _t(f, x):
        t0 = time.perf_counter()
        _ = float(f(x))
        return time.perf_counter() - t0

    # ---- real intermediates (eager, once) ----
    pre = jax.jit(lambda fr: stages.model_input(
        stages.geometric_preprocess(fr, cfg), cfg))
    x = pre(frames)
    from unet_tpu.models import fast_forward as _ff
    from unet_tpu.models import quantized as _q
    if args.dtype == "int8":
        fwd = jax.jit(lambda xx: _q.int8_apply(
            variables, xx, cfg.segment.int8_scales, dtype=jnp.bfloat16))
    else:
        fwd = jax.jit(lambda xx: _ff.fast_apply(variables, xx,
                                                dtype=jnp.bfloat16))
    logits = fwd(x)
    cable_m, tape_m = jax.jit(
        lambda lg: stages.extract_masks(lg, cfg))(logits)
    resize_back = jax.jit(lambda cm, tm: (
        _image.resize_nearest(cm, (H, W), channel_dim=False),
        _image.resize_nearest(tm, (H, W), channel_dim=False)))
    cable_f, tape_f = resize_back(cable_m, tape_m)
    roi_both = jax.jit(lambda c, t: (stages.roi_limit(c, cfg.roi, (H, W)),
                                     stages.roi_limit(t, cfg.roi, (H, W))))
    cable, tape = roi_both(cable_f, tape_f)
    framesf = jax.jit(lambda fr: stages.geometric_preprocess(fr, cfg))(frames)
    gray = jax.jit(_color.bgr2gray)(framesf)

    # crop bounds exactly as stages._burr_on_roi_crop computes them
    b = cfg.burr
    r = cfg.roi.scaled((W, H)) if cfg.roi.space != (W, H) else cfg.roi
    pad = b.band_px + max(b.close_ksize, b.open_ksize) + 24
    x1, x2 = max(r.x1 - pad, 0), min(r.x2 + pad, W)
    y1, y2 = max(r.y1 - pad, 0), min(r.y2 + pad, H)
    x2 = min(x1 + ((x2 - x1 + 127) // 128) * 128, W)
    gray_c = gray[..., y1:y2, x1:x2]
    cable_c = cable[..., y1:y2, x1:x2]
    print(f"# burr crop {gray_c.shape} (x {x1}:{x2}, y {y1}:{y2})")

    se_band = _morph.ellipse_kernel(b.band_px)
    band = jax.jit(lambda c: _morph.outer_band(c, se_band))(cable_c)
    blurred = jax.jit(lambda g: jnp.round(_image.gaussian_blur(
        g, b.blur_ksize, b.blur_sigma, channel_dim=False)))(gray_c)
    edges = jax.jit(lambda g: _edges.canny(g, b.canny_low, b.canny_high))(
        blurred)
    cand0 = jnp.logical_and(edges, band)
    se_close = _morph.ellipse_kernel(b.close_ksize)
    se_open = _morph.ellipse_kernel(b.open_ksize)
    cand = jax.jit(lambda c: _morph.open_(_morph.close_(c, se_close),
                                          se_open))(cand0)
    print(f"# burr candidates after morph: {int(jnp.sum(cand))} px "
          f"(content-dependent CC cost)")
    burr_fn = stages._BURR_METHODS[cfg.burr.method]

    rows = []

    def add(name, ms_batch):
        rows.append((name, ms_batch, ms_batch / B))
        print(f"{name:28s} {ms_batch:9.3f} ms/b{B}  {ms_batch / B:7.4f} ms/f",
              flush=True)

    # ---- the fused full step (the thing the official bench runs) ----
    add("FULL fused step", timed(
        lambda fr: stages.run_pipeline(variables, fr, model, cfg), frames))

    # ---- per-op standalone ----
    add("pre+model_input", timed(lambda fr: pre(fr), frames))
    add("forward_" + args.dtype, timed(lambda xx: fwd(xx), x))
    add("argmax/extract_masks", timed(
        lambda lg: stages.extract_masks(lg, cfg), logits))
    add("mask_resize_back x2", timed(
        lambda cm, tm: resize_back(cm, tm), cable_m, tape_m))
    add("roi_limit x2", timed(lambda c, t: roi_both(c, t), cable_f, tape_f))
    add("bgr2gray", timed(lambda fr: _color.bgr2gray(fr), framesf))
    add("burr_total (cond+crop)", timed(
        lambda g, c: jax.lax.cond(
            jnp.any(c),
            lambda gg, cc_: stages._burr_on_roi_crop(gg, cc_, cfg, burr_fn,
                                                     (H, W)),
            lambda gg, cc_: jnp.zeros_like(cc_), g, c),
        gray, cable))
    add("  band (outer_band)", timed(
        lambda c: _morph.outer_band(c, se_band), cable_c))
    add("  gaussian_blur", timed(
        lambda g: jnp.round(_image.gaussian_blur(
            g, b.blur_ksize, b.blur_sigma, channel_dim=False)), gray_c))
    add("  canny (incl hysteresis)", timed(
        lambda g: _edges.canny(g, b.canny_low, b.canny_high), blurred))
    add("  morph close+open", timed(
        lambda c: _morph.open_(_morph.close_(c, se_close), se_open), cand0))
    add("  cc_filter", timed(lambda c: stages._cc_filter(c, b), cand))
    add("classmap+px_sums", timed(
        lambda c, t, bu: (
            jnp.where(bu, jnp.uint8(3),
                      jnp.where(t, jnp.uint8(2),
                                jnp.where(c, jnp.uint8(1), jnp.uint8(0)))),
            jnp.sum(c, axis=(-2, -1), dtype=jnp.int32),
            jnp.sum(t, axis=(-2, -1), dtype=jnp.int32),
            jnp.sum(bu, axis=(-2, -1), dtype=jnp.int32)),
        cable, tape, jnp.zeros_like(cable)))

    full = rows[0][1]
    top = [r for r in rows[1:] if not r[0].startswith("  ")]
    ssum = sum(r[1] for r in top)
    print(f"\nsum of top-level ops: {ssum:.2f} ms/b{B} ({ssum / B:.4f} ms/f) "
          f"vs full {full:.2f} ({full / B:.4f}) — "
          f"gap {full - ssum:+.2f} ms/b (fusion + launch floors)")
    nc = [r for r in top if not r[0].startswith("forward")]
    ncs = sum(r[1] for r in nc)
    print(f"non-conv standalone sum: {ncs:.2f} ms/b ({ncs / B:.4f} ms/f); "
          "shares: " + ", ".join(
              f"{n.strip()} {m / ncs:.0%}" for n, m, _ in nc))


if __name__ == "__main__":
    main()
