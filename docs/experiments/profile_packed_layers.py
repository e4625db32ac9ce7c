"""Per-layer profile of the SHIPPED phase-packed forward (VERDICT r3 item 4).

PERF.md §2 profiled the un-packed forward; this profiles the program the
bench/engine actually run (models/fast_forward.py, bf16, packed). Method:
trace nested_unet_forward_fast at the target shape with an instrumented
_conv that records every (input shape, kernel shape, stride), then time each
conv standalone on the chip with an internal lax.scan loop (K iterations per
program) so the ~1 ms relay launch floor amortizes away. For each layer:
ms/frame, GFLOP, achieved TF/s, % of v5e MXU peak (197 TF/s bf16), and the
HBM roofline bound max(flops/peak_tf, bytes/bw) — layers at their roofline
are architecture-bound, not scheduling loss.

Run: python docs/experiments/profile_packed_layers.py [--batch 32] [--size 512]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

PEAK_TF = 197.0     # v5e bf16 MXU peak, TF/s
HBM_GBS = 819.0     # v5e HBM bandwidth, GB/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--loops", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.models import NestedUNet, fast_forward as ff

    enable_compilation_cache()
    B, S = args.batch, args.size
    model = NestedUNet(num_classes=3, deep_supervision=True,
                       dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                           train=False)
    fp = ff.prepare_fast_params(variables)  # carries a dtype field — not jittable as a return value

    convs = []
    real_conv = ff._conv

    def spy_conv(x, w, b, stride, padding):
        convs.append((tuple(x.shape), tuple(np.asarray(w.shape)), stride,
                      padding, str(x.dtype)))
        return real_conv(x, w, b, stride, padding)

    ff._conv = spy_conv
    # fp is closed over (its dtype field is not a valid abstract-array arg)
    jax.eval_shape(lambda x: ff.nested_unet_forward_fast(fp, x),
                   jnp.zeros((B, S, S, 3), jnp.bfloat16))
    ff._conv = real_conv

    # label convs in call order: 9 blocks x 2 convs + the head path
    names = []
    for blk in ff.BLOCK_NAMES:
        names += [f"{blk}.1", f"{blk}.2"]
    while len(names) < len(convs):
        names.append("final")

    rng = np.random.default_rng(0)
    rows = []
    total_ms = total_gf = 0.0
    for name, (xs, ws, stride, pad, dt) in zip(names, convs):
        x = jnp.asarray(rng.normal(0, 1, xs), jnp.bfloat16)
        kh, kw, cin, cout = ws
        w = jnp.asarray(rng.normal(0, 0.05, ws), jnp.bfloat16)
        bb = jnp.zeros((cout,), jnp.bfloat16)
        oh, ow = xs[1] // stride, xs[2] // stride
        gflop = 2.0 * xs[0] * oh * ow * kh * kw * cin * cout / 1e9
        bytes_ = 2.0 * (np.prod(xs) + np.prod(ws) + xs[0] * oh * ow * cout)

        k = args.loops

        def run(x, w=w, bb=bb, stride=stride, pad=pad, k=k):
            def body(carry, _):
                y = real_conv(carry, w, bb, stride, pad)
                # single-row in-place bump ties iteration i+1's input to
                # iteration i's output so XLA cannot hoist the loop-invariant
                # conv out of the scan; costs O(one row), not a full pass
                bump = (y.mean() * 1e-6).astype(carry.dtype)
                row = jax.lax.dynamic_slice(
                    carry, (0, 0, 0, 0), (carry.shape[0], 1) + carry.shape[2:])
                carry = jax.lax.dynamic_update_slice(carry, row + bump,
                                                     (0, 0, 0, 0))
                return carry, None
            final, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.float32(final.mean())

        f = jax.jit(run)
        _ = float(f(x))
        reps = []
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(f(x))
            reps.append(time.perf_counter() - t0)
        ms = min(reps) / k * 1000.0
        tf = gflop / ms  # GFLOP / ms == TF/s
        roof_ms = max(gflop / PEAK_TF, bytes_ / (HBM_GBS * 1e6))
        rows.append((name, xs, ws, stride, ms, gflop, tf,
                     100 * tf / PEAK_TF, roof_ms))
        total_ms += ms
        total_gf += gflop

    print(f"\npacked forward per-layer profile  B={B} {S}x{S} bf16 "
          f"(scan k={args.loops}, best of 3)")
    print(f"{'layer':10s} {'in':>20s} {'kernel':>16s} {'ms':>8s} "
          f"{'GFLOP':>7s} {'TF/s':>6s} {'%MXU':>5s} {'roof_ms':>8s} {'x_roof':>6s}")
    for name, xs, ws, stride, ms, gf, tf, mfu, roof in rows:
        print(f"{name:10s} {str(xs):>20s} {str(ws):>16s} {ms:8.3f} "
              f"{gf:7.1f} {tf:6.1f} {mfu:5.1f} {roof:8.3f} {ms / roof:6.2f}")
    print(f"\nsum of conv layers: {total_ms:.2f} ms/batch "
          f"({total_ms / B:.3f} ms/frame), {total_gf:.0f} GFLOP, "
          f"aggregate {total_gf / total_ms:.1f} TF/s "
          f"= {100 * total_gf / total_ms / PEAK_TF:.1f} % MXU peak")


if __name__ == "__main__":
    main()
