"""Decoder-level formulation shootout at the official point (b96 int8 512^2).

The r5 pair-form profile (profile_int8_forward.py at HEAD) shows
conv0_4.1+requant at 0.2845 ms/frame — 2.3x the 0.122 the same conv cost in
cat form — because the pair split materializes TWO (256^2, 128) int32
accumulators and an unfused add (~33 MB/frame of extra int32 traffic),
which at the full-res level outweighs the 25 MB/frame cat it avoids. The
upsample feeding it (up_int8 conv1_3, 0.1104 ms/f) writes a full 512^2x64
tensor through a dense-matrix matmul.

Variants measured JOINTLY (up + skip-prep + conv + requant, the whole
level-entry cost) per decoder level:

  pair_dense   — shipped: dense-matmul up_int8, (skip, up) pair conv
  pair_gather  — gather-lerp up_int8, pair conv
  cat_dense    — dense-matmul up_int8, concat, single conv
  cat_gather   — gather-lerp up_int8, concat, single conv (gather + unpack
                 are elementwise-ish producers XLA can fuse into the concat
                 write, unlike a matmul)

Run: python docs/experiments/measure_decoder_cat_forms.py [--batch 96]
Recorded: docs/PERF.md §2c2.
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--loops", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.models import NestedUNet
    from unet_tpu.models import quantized as q
    from unet_tpu.models.fast_forward import unpack_phases
    from unet_tpu.ops.image import _upsample2x_matrix

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
    k = args.loops

    def up_gather_int8(xq, dtype):
        """_up_int8 with gather-lerp instead of the dense-matrix matmul;
        weights read off the dense matrix so values match the shipped form
        up to MXU-f32-emulation noise (<= 3e-7, below the int8 round grid
        almost everywhere)."""
        def axis_up(t, axis):
            n = t.shape[axis]
            m = np.asarray(_upsample2x_matrix(n))
            src = np.arange(2 * n, dtype=np.float64) * (n - 1) / (2 * n - 1)
            i0 = np.minimum(np.floor(src).astype(np.int64), n - 2)
            w0 = m[np.arange(2 * n), i0]
            w1 = m[np.arange(2 * n), i0 + 1]
            shape = [1] * t.ndim
            shape[axis] = 2 * n
            return (jnp.take(t, jnp.asarray(i0), axis=axis)
                    * jnp.asarray(w0).reshape(shape).astype(t.dtype)
                    + jnp.take(t, jnp.asarray(i0 + 1), axis=axis)
                    * jnp.asarray(w1).reshape(shape).astype(t.dtype))
        y = axis_up(axis_up(xq.astype(dtype), xq.ndim - 3), xq.ndim - 2)
        return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    def timed(fn, x0, reps=3):
        def run(x0):
            def body(carry, _):
                out = fn(carry)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(out))
                bump = s * 1e-30 > 1.0
                leaves, treedef = jax.tree_util.tree_flatten(carry)
                c0 = leaves[0]
                v = jax.lax.dynamic_slice(c0, (0,) * c0.ndim,
                                          (1,) * c0.ndim)
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
            best = min(best or 1e9, time.perf_counter() - t0)
        return best / k * 1000.0

    r = np.random.default_rng(0)

    def rand_i8(shape):
        return jnp.asarray(r.integers(0, 127, shape, dtype=np.int8))

    # (level, skip block name [packed out], up source name, skip shape
    #  in its stored layout, up-source shape)
    n2 = S // 2
    n4 = S // 4
    levels = [
        ("conv0_4", "conv0_0", "conv1_3",
         (B, n2, n2, 128), (B, n2, n2, 64)),
        ("conv1_3", "conv1_0", "conv2_2",
         (B, n4, n4, 256), (B, n4, n4, 128)),
    ]

    for name, skip_name, up_name, skip_shape, up_shape in levels:
        l1 = qp.blocks[name][0]
        out_scale = sc[f"{name}.relu1"]
        up_scale = sc[f"{up_name}.relu2"]
        skip_packed = qp.blocks[skip_name][1].packed
        xs = rand_i8(skip_shape)
        xu = rand_i8(up_shape)

        def mk(up_fn, as_pair):
            def f(inputs):
                s_, u_ = inputs
                a = unpack_phases(s_) if skip_packed else s_
                b = up_fn(u_)
                t = (a, b) if as_pair else jnp.concatenate([a, b], axis=-1)
                return q._requant(q._qconv(t, l1), l1, out_scale, qp.dtype)
            return f

        up_dense = lambda u: q._up_int8(u, up_scale, qp.dtype)  # noqa: E731
        up_gath = lambda u: up_gather_int8(u, qp.dtype)         # noqa: E731

        # gather variants dropped: measure_upsample_forms.py showed TPU
        # gathers 10x slower than the dense-matrix contraction, so the
        # cat_gather fusion hypothesis is dead on arrival
        del up_gath
        variants = [("pair_dense", mk(up_dense, True)),
                    ("cat_dense", mk(up_dense, False))]
        row = [f"{name}:"]
        for vname, fn in variants:
            ms = timed(fn, (xs, xu))
            row.append(f"{vname} {ms:8.3f} ms/b{B} ({ms / B:.4f}/f)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
