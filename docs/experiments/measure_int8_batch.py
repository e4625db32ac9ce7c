"""Probe: int8 chunked two_stage at large batches (128/160/192/224).

bf16 OOMs at batch 160 (PERF.md 3f); int8 stores inter-layer tensors as
int8 (half of bf16), so larger batches may fit and keep amortizing the
per-kernel launch floor. Run standalone on the TPU:

    python docs/experiments/measure_int8_batch.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

from bench import _pipeline_bench, _synthetic_frames, _throughput  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from unet_tpu.core.config import enable_compilation_cache
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import get_preset, stages

    enable_compilation_cache()
    cfg = get_preset("two_stage").replace_in("segment", fast_forward=True)
    model = NestedUNet(num_classes=cfg.segment.num_classes,
                       deep_supervision=True, dtype=jnp.bfloat16)
    w, h = cfg.preprocess.model_size
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
                           train=False)
    calib = _synthetic_frames(np.random.default_rng(7), 8)
    cfg = stages.calibrate_int8(model, variables, cfg, [calib])
    chunked = stages.build_chunked_step(model, cfg)
    chunk = 4
    rng = np.random.default_rng(0)
    for batch in (128, 160, 192, 224):
        frames = _synthetic_frames(rng, chunk * batch)
        t0 = time.perf_counter()
        try:
            fps, med = _throughput(
                chunked, variables,
                frames.reshape((chunk, batch) + frames.shape[1:]),
                chunk * batch)
        except Exception as e:
            print(f"batch {batch}: SKIP ({type(e).__name__}: "
                  f"{str(e)[:120]})")
            continue
        print(f"batch {batch}: {fps:.1f} FPS best / {med:.1f} median "
              f"(wall incl compile {time.perf_counter() - t0:.0f}s)")


if __name__ == "__main__":
    main()
