"""NLM-vs-bilateral fidelity on the enhanced preset (VERDICT r3 item 5).

The reference's --enhance path denoises with cv2.fastNlMeansDenoisingColored
(infer_enhanced_burr.py:58); the enhanced preset here defaults to the
reference's own configurable bilateral alternative (src/refactor/config.py:51).
This experiment quantifies what that substitution costs at the level that
matters — the produced masks — by running the SAME trained model + full
enhanced pipeline with three device denoisers and against a host ground
truth whose enhancement is cv2's own code path:

  cv2    CLAHE(3.0, 8x8 on L) -> fastNlMeansDenoisingColored(10,10,7,21)
         -> 3x3 sharpen, all with cv2, then the pipeline with enhance=False
  nlm    device pipeline, denoise="nlm" (ops/frames.nlm_denoise_colored)
  bilat  device pipeline, denoise="bilateral" (shipped default)
  none   device pipeline, denoise="none"

Reported per variant: PSNR of the enhanced frames vs the cv2 frames,
class-map agreement vs the cv2-pipeline masks, val mIoU vs labels, burr px.
Frames are HARD synthetic cable scenes (conftest.hard_cable_scene recipe)
with sigma-12 sensor noise — the content class where a denoiser choice
could plausibly move masks.

Run: timeout 590 python docs/experiments/measure_nlm_masks.py   (CPU ok)
"""
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

# NB: sys.path, not PYTHONPATH — a PYTHONPATH entry breaks this image's
# axon PJRT plugin discovery (backend 'axon' not in known backends)
REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    tempfile.gettempdir(), f"unet_tpu_jax_cache_{os.getuid()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import cv2
import jax.numpy as jnp

from conftest import hard_cable_scene
from unet_tpu.models import NestedUNet
from unet_tpu.pipeline import get_preset, stages
from unet_tpu.train import LossCfg, OptimCfg, create_train_state
from unet_tpu.train.trainer import make_train_step

H = W = 64  # hard_cable_scene native size; 512^2 compiles minutes on CPU


def cv2_enhance(frame_u8):
    """The reference's enhance_image (infer_enhanced_burr.py:38-66), verbatim
    semantics with cv2: CLAHE(3.0, 8x8) on L, fastNlMeansDenoisingColored
    (h=10, hColor=10, template=7, search=21), 3x3 sharpen."""
    lab = cv2.cvtColor(frame_u8, cv2.COLOR_BGR2LAB)
    l, a, b = cv2.split(lab)
    l = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(l)
    enhanced = cv2.cvtColor(cv2.merge([l, a, b]), cv2.COLOR_LAB2BGR)
    enhanced = cv2.fastNlMeansDenoisingColored(enhanced, None, 10, 10, 7, 21)
    kernel = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]])
    return cv2.filter2D(enhanced, -1, kernel)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def miou(pred, labels, n=3):
    ious = []
    for c in range(n):
        inter = ((pred == c) & (labels == c)).sum()
        union = ((pred == c) | (labels == c)).sum()
        if union:
            ious.append(inter / union)
    return float(np.mean(ious))


def main():
    # --- trained model on cv2-ENHANCED hard scenes (same recipe as
    # test_quantized otherwise). Training on raw scenes makes every variant
    # collapse to ~0.30 mIoU on enhanced input (first recorded run of this
    # script): the enhance chain is a domain shift the model must be
    # trained under for the denoiser comparison to have discriminating
    # power — the masks being compared must carry signal. ---
    imgs, masks = zip(*[hard_cable_scene(seed=s) for s in range(16)])
    images = np.stack([cv2_enhance(f) for f in imgs]).astype(np.float32) / 255.0
    labels = np.stack(masks).astype(np.int32)
    model = NestedUNet(num_classes=3, deep_supervision=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3),
                               OptimCfg(lr=3e-3, schedule="constant",
                                        total_steps=240, clip_norm=10.0))
    step = jax.jit(make_train_step(LossCfg(kind="ce")))
    t0 = time.time()
    for _ in range(240):
        state, _ = step(state, images, labels)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"# trained 120 steps in {time.time() - t0:.0f}s")

    # held-out noisy scenes the pipeline will see
    val = [hard_cable_scene(seed=100 + s) for s in range(8)]
    frames = np.stack([v[0] for v in val])          # uint8 BGR
    val_labels = np.stack([v[1] for v in val]).astype(np.int32)

    # keep the enhance chain + multiscale burr stage but run at the scenes'
    # native 64^2 (no rotate/normalize: the preset's forced 800x448 would
    # resize the frames away from the labels' grid)
    base = get_preset("enhanced", enhance=True).replace_in(
        "preprocess", model_size=(W, H), rotate90_ccw=False,
        normalize_wh=None)
    # model trained at native scene scale: keep the ROI the full frame
    base = base.replace_in("roi", x1=0, y1=0, x2=W, y2=H, space=(W, H))

    # --- ground truth: cv2 enhancement feeding the enhance-less pipeline ---
    cv2_frames = np.stack([cv2_enhance(f) for f in frames])
    cfg_plain = base.replace_in("preprocess", enhance=False)
    out_cv2 = stages.build_step(model, cfg_plain)(variables,
                                                  jnp.asarray(cv2_frames))
    cm_cv2 = np.asarray(out_cv2.class_map)

    rows = []
    for name, denoise in (("nlm", "nlm"), ("bilateral", "bilateral"),
                          ("none", "none")):
        cfg = base.replace_in("preprocess", denoise=denoise)
        enh = np.clip(np.round(np.asarray(stages.enhance_frames(
            jnp.asarray(frames, jnp.float32), cfg))), 0, 255).astype(np.uint8)
        t0 = time.time()
        out = stages.build_step(model, cfg)(variables, jnp.asarray(frames))
        cm = np.asarray(out.class_map)
        rows.append({
            "denoise": name,
            "psnr_vs_cv2": round(psnr(enh, cv2_frames), 2),
            "classmap_agree_vs_cv2": round(float((cm == cm_cv2).mean()), 4),
            "miou_vs_labels": round(miou(np.where(cm == 3, 1, cm), val_labels), 4),
            "burr_px": int(np.asarray(out.burr_px).sum()),
            "wall_s_incl_compile": round(time.time() - t0, 1),
        })
    rows.append({"denoise": "cv2(ground truth)", "psnr_vs_cv2": float("inf"),
                 "classmap_agree_vs_cv2": 1.0,
                 "miou_vs_labels": round(miou(np.where(cm_cv2 == 3, 1, cm_cv2), val_labels), 4),
                 "burr_px": int(np.asarray(out_cv2.burr_px).sum()),
                 "wall_s_incl_compile": None})
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
