"""Attack on the lane-starved 512^2 packed convs (VERDICT r4 item 4b).

profile_packed_layers.py showed the packed (4,4,32,128)/s2 convs whose INPUT
is a 32-channel full-res tensor run at ~30-33 % MXU, 3x their roofline
(conv0_0.2, conv1_0.1, conv0_4.2), while the same-kernel convs with C_in>=64
hit 49-77 %. Hypothesis: the (8,128) VMEM tile pads a C=32 minor dimension
4x, so every input load wastes 3/4 of the tile bandwidth — a LAYOUT loss,
not a FLOP loss.

Candidate fix measured here: **packed-to-packed conv** — keep the previous
layer's output in its packed phase-major layout (H/2, W/2, 4C = 128 lanes
full) and express the stride-1 3x3 conv on the full-res grid directly on
that layout as a 3x3 COARSE conv (3,3,4C,4C') whose kernel scatters the
original taps by (input phase, output phase) offset:

    K[r+1, s+1, (p,q,cin), (a,b,cout)] = W[2r+p-a+1, 2s+q-b+1, cin, cout]
    (zero where the index falls outside the 3x3 original kernel)

Each (output-phase, input-phase) pair activates a 2x2 subset of the 3x3
coarse window, so the dense coarse kernel carries 9/4 the useful FLOPs —
the bet is that full 128-lane input tiles more than repay 2.25x FLOPs at
>2x the achieved TF/s, AND the full-res unpack transpose between blocks
disappears from the program entirely.

Measures at B=32 512^2 bf16 (scan-k launch-floor amortization, best of 3):
  B  current: conv(4,4,32,128)/s2 on the unpacked (512^2,32) tensor, PLUS
     the unpack_phases transpose the pipeline pays to produce that input
  C  packed-to-packed: conv(3,3,128,128)/s1 on the packed (256^2,128) tensor
  U  unpack_phases alone at (32,256,256,128) (the deleted transpose)
  D  stem: space-to-depth input (256^2,12) + conv(3,3,12,128)/s1
     (contraction 108 of 128) vs the current (4,4,3,128)/s2 @512^2
plus numerical equivalence checks (same math, bf16 reassociation).

Run: python docs/experiments/measure_packed_to_packed.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402


def pack_to_coarse_kernel(w: np.ndarray) -> np.ndarray:
    """(3,3,Cin,Cout) stride-1 full-res kernel -> (3,3,4Cin,4Cout) coarse
    kernel on the phase-major packed layout (phase index (a,b) -> a*2+b)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    k = np.zeros((3, 3, 4, cin, 4, cout), w.dtype)
    for r in (-1, 0, 1):
        for s in (-1, 0, 1):
            for p in range(2):
                for q in range(2):
                    for a in range(2):
                        for b in range(2):
                            di, dj = 2 * r + p - a, 2 * s + q - b
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                k[r + 1, s + 1, p * 2 + q, :, a * 2 + b, :] = \
                                    w[di + 1, dj + 1]
    return k.reshape(3, 3, 4 * cin, 4 * cout)


def s2d_jnp(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C) phase-major space-to-depth (device)."""
    import jax.numpy as jnp
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        B, H // 2, W // 2, 4 * C)


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.models import fast_forward as ff

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, K = 32, 30

    def timed_loop(body_fn, x):
        """Scan body_fn K times with a one-row carry bump (anti-hoist),
        return ms per iteration, best of 3."""
        def run(x):
            def body(c, _):
                y = body_fn(c)
                bump = (y.mean() * 1e-6).astype(c.dtype)
                row = jax.lax.dynamic_slice(
                    c, (0, 0, 0, 0), (c.shape[0], 1) + c.shape[2:])
                return jax.lax.dynamic_update_slice(
                    c, row + bump, (0, 0, 0, 0)), None
            final, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.float32(final.mean())
        f = jax.jit(run)
        _ = float(f(x))
        reps = []
        for _r in range(3):
            t0 = time.perf_counter()
            _ = float(f(x))
            reps.append(time.perf_counter() - t0)
        return min(reps) / K * 1000.0

    # ---- l2-style conv: 32 -> 32 channels at full-res 512^2 ----
    w = rng.normal(0, 0.05, (3, 3, 32, 32)).astype(np.float32)
    b = rng.normal(0, 0.01, (32,)).astype(np.float32)
    w4, b4 = ff._pack3x3(jnp.asarray(w), jnp.asarray(b))       # (4,4,32,128)
    kc = jnp.asarray(pack_to_coarse_kernel(w))                 # (3,3,128,128)
    bc = jnp.tile(jnp.asarray(b), 4)

    # generate data ON DEVICE and compare ON DEVICE (download scalars only):
    # ~0.5 GB host uploads through the dev relay wedge the tunnel
    x_full = jax.random.normal(jax.random.PRNGKey(0), (B, 512, 512, 32),
                               jnp.bfloat16)
    x_pack = jax.jit(s2d_jnp)(x_full)

    @jax.jit
    def equiv(x_full, x_pack):
        yb = ff._conv(x_full, w4, b4, 2, 1).astype(jnp.float32)
        yc = ff._conv(x_pack, kc, bc, 1, 1).astype(jnp.float32)
        d = jnp.abs(yb - yc)
        return d.max(), d.mean(), jnp.abs(yb).mean()

    dmax, dmean, ref = (float(v) for v in equiv(x_full, x_pack))
    print(f"equivalence packed-to-packed vs unpacked/s2: max|d|={dmax:.4f}"
          f" mean|d|={dmean:.5f} (|y|~{ref:.2f}, bf16 reassoc)", flush=True)

    gf_use = 2.0 * B * 256 * 256 * 16 * 32 * 128 / 1e9   # useful = current
    gf_c = 2.0 * B * 256 * 256 * 9 * 128 * 128 / 1e9     # dense coarse

    ms_b = timed_loop(
        lambda c: ff.unpack_phases(ff._conv(c, w4, b4, 2, 1)), x_full)
    ms_c = timed_loop(lambda c: ff._conv(c, kc, bc, 1, 1), x_pack)
    print(f"B: conv(4,4,32,128)/s2 @512^2 + unpack : {ms_b:7.3f} ms  "
          f"useful {gf_use:5.1f} GF  {gf_use / ms_b:6.1f} TF/s-useful",
          flush=True)
    print(f"C: packed conv(3,3,128,128)/s1 @256^2  : {ms_c:7.3f} ms  "
          f"dense {gf_c:5.1f} GF  {gf_c / ms_c:6.1f} TF/s-dense "
          f"({gf_use / ms_c:6.1f} TF/s-useful)", flush=True)
    print(f"   -> packed-to-packed speedup incl. deleted unpack: "
          f"{ms_b / ms_c:4.2f}x", flush=True)

    # the conv alone (no unpack) for an apples-to-FLOPs view; feed the scan
    # via a scalar reduction so the carry keeps the conv-input shape
    ms_b0 = timed_loop(
        lambda c: ff._conv(c, w4, b4, 2, 1).astype(c.dtype)
        .sum(axis=(1, 2, 3), keepdims=True) + c, x_full)
    print(f"   (conv-only baseline via reduce-feedback: {ms_b0:6.3f} ms — "
          f"upper-bounds the conv at {gf_use / ms_b0:5.1f} TF/s-useful)",
          flush=True)

    # ---- D: the stem (C_in=3) ----
    w_stem = rng.normal(0, 0.05, (3, 3, 3, 32)).astype(np.float32)
    b_stem = rng.normal(0, 0.01, (32,)).astype(np.float32)
    w4s, b4s = ff._pack3x3(jnp.asarray(w_stem), jnp.asarray(b_stem))
    k_stem = jnp.asarray(pack_to_coarse_kernel(w_stem))        # (3,3,12,128)
    b_stem4 = jnp.tile(jnp.asarray(b_stem), 4)
    x3 = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 512, 3),
                           jnp.bfloat16)
    x3p = jax.jit(s2d_jnp)(x3)

    @jax.jit
    def equiv_stem(x3, x3p):
        ys_a = ff._conv(x3, w4s, b4s, 2, 1).astype(jnp.float32)
        ys_b = ff._conv(x3p, k_stem, b_stem4, 1, 1).astype(jnp.float32)
        return jnp.abs(ys_a - ys_b).max()

    print(f"stem equivalence s2d-coarse vs packed/s2: "
          f"max|d|={float(equiv_stem(x3, x3p)):.4f}", flush=True)

    gf_stem = 2.0 * B * 256 * 256 * 16 * 3 * 128 / 1e9
    gf_sd = 2.0 * B * 256 * 256 * 9 * 12 * 128 / 1e9
    ms_sa = timed_loop(
        lambda c: ff._conv(c, w4s, b4s, 2, 1).sum(axis=(1, 2, 3),
                                                  keepdims=True) + c, x3)
    ms_sd = timed_loop(lambda c: ff._conv(c, k_stem, b_stem4, 1, 1), x3p)
    # s2d of the raw frame on-device (the new prep the pipeline would pay)
    ms_s2d = timed_loop(
        lambda c: s2d_jnp(c), x3)

    print(f"stem A: conv(4,4,3,128)/s2 @512^2 (reduce-feedback): "
          f"{ms_sa:6.3f} ms  useful {gf_stem:4.1f} GF", flush=True)
    print(f"stem D: s2d + conv(3,3,12,128)/s1 @256^2: conv {ms_sd:6.3f} ms + "
          f"s2d {ms_s2d:6.3f} ms  dense {gf_sd:4.1f} GF", flush=True)


if __name__ == "__main__":
    main()
