"""Per-op breakdown of the int8 forward at the OFFICIAL operating point
(VERDICT r5: the r5 non-conv profile showed the rule stack costs only
0.32 ms/frame at b96 int8 — the forward's 2.03 ms/frame is 87 % of the
step, so the headline lever is INSIDE the forward).

Decomposes nested_unet_forward_int8 (models/quantized.py) at B=96 512^2 on
real intermediates: each block's conv1/conv2 WITH its fused requant
epilogue (the shipped fusion), the int8 upsamples, the input quantize, the
packed final head, and the unpack/pool/concat glue as (full - sum of
parts). Compare per-layer against PERF.md §2b's bf16 packed table: int8
layers slower than their bf16 twin mark epilogue/layout overhead, not
MXU-bound compute.

Run: python docs/experiments/profile_int8_forward.py [--batch 96]
Recorded: docs/PERF.md §2c.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

PEAK_TF_INT8 = 394.0   # v5e int8 MXU peak, TOPS
PEAK_TF_BF16 = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--loops", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.models import NestedUNet
    from unet_tpu.models import quantized as q
    from unet_tpu.models.fast_forward import phase_max, unpack_phases

    enable_compilation_cache()
    B, S = args.batch, args.size
    model = NestedUNet(num_classes=3, deep_supervision=True,
                       dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                           train=False)
    calib = bench._synthetic_frames(np.random.default_rng(7), 8, h=S, w=S)
    scales = q.calibrate(variables, [calib.astype(np.float32) / 255.0])
    qp = q.prepare_int8_params(variables, scales)
    sc = qp.scales

    frames = bench._synthetic_frames(np.random.default_rng(0), B, h=S, w=S)
    x = jnp.asarray(frames.astype(np.float32) / 255.0)

    k = args.loops

    def timed(fn, x0, reps=3):
        """ms per fn(x0) call under a k-iteration scan with a single-element
        data-dependent bump (same anti-hoist method as the other profiles).
        `x0` may be a pytree (the concat-free decoder consumes (skip, up)
        pairs); the bump lands on the first leaf."""
        def run(x0):
            def body(carry, _):
                out = fn(carry)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(out))
                bump = s * 1e-30 > 1.0  # False at runtime, unknown to XLA
                leaves, treedef = jax.tree_util.tree_flatten(carry)
                c0 = leaves[0]
                v = jax.lax.dynamic_slice(
                    c0, (0,) * c0.ndim, (1,) * c0.ndim)
                leaves[0] = jax.lax.dynamic_update_slice(
                    c0, v + bump.astype(c0.dtype), (0,) * c0.ndim)
                return jax.tree_util.tree_unflatten(treedef, leaves), s
            final, ss = jax.lax.scan(body, x0, None, length=k)
            f0 = jax.tree_util.tree_leaves(final)[0]
            return jnp.float32(ss[-1]) + jnp.float32(
                f0.astype(jnp.float32).ravel()[0])

        f = jax.jit(run)
        _ = float(f(x0))
        best = None
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(f(x0))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / k * 1000.0

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:26s} {ms:9.3f} ms/b{B}  {ms / B:7.4f} ms/f", flush=True)

    # ---- full forward (the thing the bench runs) ----
    fwd = lambda xx: q.nested_unet_forward_int8(qp, xx)  # noqa: E731
    add("FULL int8 forward", timed(fwd, x))

    # ---- real intermediates, captured eagerly ----
    quant_in = jax.jit(lambda xx: jnp.clip(
        jnp.round(xx.astype(jnp.float32) / sc["input"]),
        -127, 127).astype(jnp.int8))
    xq = quant_in(x)

    def conv_rq(name, idx, keep_packed):
        l1, l2 = qp.blocks[name]
        if idx == 0:
            return lambda t: (unpack_phases(
                q._requant(q._qconv(t, l1), l1, sc[f"{name}.relu1"], qp.dtype))
                if l1.packed else
                q._requant(q._qconv(t, l1), l1, sc[f"{name}.relu1"], qp.dtype))
        def f2(t):
            y = q._requant(q._qconv(t, l2), l2, sc[f"{name}.relu2"], qp.dtype)
            return unpack_phases(y) if (l2.packed and not keep_packed) else y
        return f2

    def is_packed(name):
        return qp.blocks[name][1].packed

    pool = jax.jit(lambda t: phase_max(t))
    pool_plain = jax.jit(q._maxpool2_int8)
    # shipped decoder is concat-free: blocks consume (skip, up) PAIRS and
    # _qconv splits along input channels (models/quantized.py _qconv)
    cat = lambda a, b: (a, b)  # noqa: E731

    total_conv = [0.0]

    # timing is interleaved with the eager walk and tensors are dropped the
    # moment no later stage needs them: keeping every b96 512^2 intermediate
    # alive OOMs the 16 G chip (first version of this script did)
    def do_block(name, tin, keep_packed=False):
        f1, f2 = conv_rq(name, 0, keep_packed), conv_rq(name, 1, keep_packed)
        ms1 = timed(f1, tin)
        mid = jax.jit(f1)(tin)
        add(f"{name}.1+requant", ms1)
        ms2 = timed(f2, mid)
        out = jax.jit(f2)(mid)
        add(f"{name}.2+requant", ms2)
        total_conv[0] += ms1 + ms2
        del mid
        return out

    def do_up(name, src):
        f = lambda t: q._up_int8(t, sc[f"{name}.relu2"], qp.dtype)  # noqa: E731
        add(f"up_int8 {name}", timed(f, src))
        return jax.jit(f)(src)

    add("input quantize", timed(lambda xx: quant_in(xx), x))
    del x

    x0_0p = do_block("conv0_0", xq, keep_packed=True)
    del xq
    t = pool(x0_0p) if is_packed("conv0_0") else pool_plain(x0_0p)
    x1_0p = do_block("conv1_0", t, keep_packed=True)
    t = pool(x1_0p) if is_packed("conv1_0") else pool_plain(x1_0p)
    x2_0 = do_block("conv2_0", t)
    x3_0 = do_block("conv3_0", pool_plain(x2_0))
    x4_0 = do_block("conv4_0", pool_plain(x3_0))
    u4 = do_up("conv4_0", x4_0)
    del x4_0
    t = cat(x3_0, u4)
    del x3_0, u4
    x3_1 = do_block("conv3_1", t)
    u3 = do_up("conv3_1", x3_1)
    del x3_1
    t = cat(x2_0, u3)
    del x2_0, u3
    x2_2 = do_block("conv2_2", t)
    u2 = do_up("conv2_2", x2_2)
    del x2_2
    x1_0f = unpack_phases(x1_0p) if is_packed("conv1_0") else x1_0p
    del x1_0p
    t = cat(x1_0f, u2)
    del x1_0f, u2
    x1_3 = do_block("conv1_3", t)
    u1 = do_up("conv1_3", x1_3)
    del x1_3
    x0_0f = unpack_phases(x0_0p) if is_packed("conv0_0") else x0_0p
    del x0_0p
    t = cat(x0_0f, u1)
    del x0_0f, u1
    x0_4p = do_block("conv0_4", t, keep_packed=True)
    del t

    def head(t):
        yd = q._dequant(t, sc["conv0_4.relu2"], qp.dtype)
        l2 = qp.blocks["conv0_4"][1]
        kk = qp.final_w.shape[-1]
        Bb, h2, w2, c4 = yd.shape
        yk = jnp.einsum("bhwpc,ck->bhwpk",
                        yd.reshape(Bb, h2, w2, 4, c4 // 4),
                        qp.final_w[0, 0].astype(qp.dtype)) \
            + qp.final_b.astype(qp.dtype)
        return unpack_phases(yk.reshape(Bb, h2, w2, 4 * kk))

    add("final head (packed 1x1)", timed(head, x0_4p))

    full = rows[0][1]
    parts = sum(m for _, m in rows[1:])
    print(f"\nsum of parts: {parts:.2f} ms/b{B} ({parts / B:.4f} ms/f) vs "
          f"full {full:.2f} ({full / B:.4f}) — glue (unpack/pool/concat + "
          f"fusion diffs) {full - parts:+.2f} ms/b")
    tc = total_conv[0]
    print(f"conv+requant total: {tc:.2f} ms/b ({tc / B:.4f} "
          f"ms/f) — PERF.md 2b bf16 conv stack was 1.475 ms/f at b32")


if __name__ == "__main__":
    main()
