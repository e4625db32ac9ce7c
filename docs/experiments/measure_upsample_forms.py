"""Compare formulations of the x2 align-corners upsample at the official
operating point's decoder shapes (b96 int8 path dequantizes to bf16, lerps,
requantizes — ops/image.py upsample2x_align_corners is the inner op).

The shipped implementation contracts a DENSE (2n, n) constant matrix per
axis (ops/image.py:114-134): n MACs per output element where the matrix has
only 2 nonzeros per row. Candidates:

  dense   — shipped: tensordot with the (2n, n) matrix, HIGHEST precision
  gather  — two jnp.take + lerp (the textbook form; TPU gathers are the
            question mark)
  banded  — tile the output axis by T: each T-row output tile reads only a
            (T//2 + 2)-row input window, so the contraction is a batched
            (T, R) @ (R, ...) matmul — FLOPs drop by ~n/R while staying
            matmul-shaped (MXU). Windows come from one strided
            sliding-window copy (~2x the lerp's read traffic).

All three produce bit-identical f32 results (every output is one exact
two-term lerp; zero matrix entries contribute exact 0.0), asserted here.

Run: python docs/experiments/measure_upsample_forms.py
Recorded: docs/PERF.md §2c2 (round 5).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.ops.image import _upsample2x_matrix, upsample2x_align_corners

    enable_compilation_cache()

    def axis_up_gather(t, axis):
        # weights read off the dense matrix rows so the products match the
        # tensordot form bit-for-bit (each row has <= 2 nonzeros)
        n = t.shape[axis]
        m = np.asarray(_upsample2x_matrix(n))
        src = np.arange(2 * n, dtype=np.float64) * (n - 1) / (2 * n - 1)
        i0 = np.minimum(np.floor(src).astype(np.int64), n - 2)
        i1 = i0 + 1
        w0 = m[np.arange(2 * n), i0]
        w1 = m[np.arange(2 * n), i1]
        shape = [1] * t.ndim
        shape[axis] = 2 * n
        w0j = jnp.asarray(w0).reshape(shape).astype(t.dtype)
        w1j = jnp.asarray(w1).reshape(shape).astype(t.dtype)
        return (jnp.take(t, jnp.asarray(i0), axis=axis) * w0j
                + jnp.take(t, jnp.asarray(i1), axis=axis) * w1j)

    def axis_up_banded(t, axis, tile=64):
        n = t.shape[axis]
        m = np.asarray(_upsample2x_matrix(n))          # (2n, n)
        T = min(tile, 2 * n)
        while (2 * n) % T:
            T -= 1
        nt = (2 * n) // T
        # input window per tile: rows [start_t, start_t + R)
        starts, ends = [], []
        for tt in range(nt):
            rows = m[tt * T:(tt + 1) * T]
            nz = np.nonzero(rows.any(axis=0))[0]
            starts.append(int(nz[0]))
            ends.append(int(nz[-1]) + 1)
        R = max(e - s for s, e in zip(starts, ends))
        starts = [min(s, n - R) for s in starts]
        mb = np.stack([m[tt * T:(tt + 1) * T, starts[tt]:starts[tt] + R]
                       for tt in range(nt)])           # (nt, T, R)
        t_axis0 = jnp.moveaxis(t, axis, 0)
        wins = jnp.stack([jax.lax.slice_in_dim(t_axis0, s, s + R, axis=0)
                          for s in starts])            # (nt, R, ...)
        y = jnp.einsum("ktr,kr...->kt...", jnp.asarray(mb).astype(t.dtype),
                       wins, precision=jax.lax.Precision.HIGHEST)
        y = y.reshape((2 * n,) + t.shape[:axis] + t.shape[axis + 1:])
        return jnp.moveaxis(y, 0, axis)

    def up_dense(x):
        return upsample2x_align_corners(x, 1, 2)

    def up_gather(x):
        return axis_up_gather(axis_up_gather(x, 1), 2)

    def up_banded(x):
        return axis_up_banded(axis_up_banded(x, 1), 2)

    # parity check. On CPU all three are bit-exact f32 (every output is one
    # exact two-term lerp). On TPU the matmul forms go through the MXU's
    # multi-pass f32 emulation even at HIGHEST, so dense/banded differ from
    # the VPU-exact gather lerp by <= ~3e-7 relative — allow that here.
    r = np.random.default_rng(0)
    xs = jnp.asarray(r.random((2, 96, 80, 8)).astype(np.float32))
    ref = np.asarray(up_dense(xs))
    tol = dict(rtol=1e-6, atol=1e-6) if jax.default_backend() != "cpu" \
        else dict(rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(up_gather(xs)), ref, **tol)
    np.testing.assert_allclose(np.asarray(up_banded(xs)), ref, **tol)
    print(f"parity ok ({'<=1e-6 on TPU' if tol['atol'] else 'bit-exact'})")

    B = 96
    k = 20

    def timed(fn, x0, reps=3):
        def run(x0):
            def body(carry, _):
                out = fn(carry)
                s = jnp.sum(out.astype(jnp.float32))
                bump = s * 1e-30 > 1.0
                v = jax.lax.dynamic_slice(carry, (0,) * carry.ndim,
                                          (1,) * carry.ndim)
                return jax.lax.dynamic_update_slice(
                    carry, v + bump.astype(carry.dtype),
                    (0,) * carry.ndim), s
            final, ss = jax.lax.scan(body, x0, None, length=k)
            return jnp.float32(ss[-1]) + jnp.float32(
                final.astype(jnp.float32).ravel()[0])
        f = jax.jit(run)
        _ = float(f(x0))
        best = None
        for _r in range(reps):
            t0 = time.perf_counter()
            _ = float(f(x0))
            best = min(best or 1e9, time.perf_counter() - t0)
        return best / k * 1000.0

    # decoder up shapes at the official point (b96, 512^2 model):
    # name: (n_in, channels) — output is (2n)^2
    shapes = [("conv4_0", 32, 512), ("conv3_1", 64, 256),
              ("conv2_2", 128, 128), ("conv1_3", 256, 64)]
    forms = [("dense", up_dense), ("gather", up_gather),
             ("banded64", up_banded),
             ("banded128", lambda x: axis_up_banded(
                 axis_up_banded(x, 1, 128), 2, 128))]
    # fused requant epilogue variant: the shipped _up_int8 rounds back to
    # int8 — keep the bench on the raw bf16 op (epilogue identical across
    # forms, fuses into the consumer either way)
    for name, n, c in shapes:
        x = jnp.asarray((r.random((B, n, n, c)) * 2 - 1).astype(np.float32)
                        ).astype(jnp.bfloat16)
        row = [f"{name} ({n}->{2*n}, C={c}):"]
        for fname, fn in forms:
            ms = timed(fn, x)
            row.append(f"{fname} {ms:8.3f} ms/b{B} ({ms/B:.4f}/f)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
