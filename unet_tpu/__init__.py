"""unet_tpu — TPU-native cable-wrapping inspection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch+OpenCV stack (Chenxu1103/UNET-, mounted at /root/reference):

  stage 1  semantic segmentation of video frames into {bg, cable, tape, defects}
           with a UNet-family CNN              -> Flax models + Pallas kernels
  stage 2  rule-based mask analysis (burr detection, wrap uniformity)
           -> batched on-device image ops (morphology/edges/CC as convolutions)
  stage 3  visualization + windowed OK/NG decisions + event logging
           -> host-side emitters fed by device-computed statistics

Unlike the reference, stage 1+2 run fused inside a single jit program per
frame batch: no host round-trip between segmentation and burr analysis.

Layout conventions
------------------
* images: ``(..., H, W, C)`` float32/bfloat16, NHWC (TPU-native)
* masks:  ``(..., H, W)`` integer class ids or bool
* all ops are jit/vmap-compatible pure functions with static shapes
"""

__version__ = "0.1.0"

from unet_tpu import ops, models  # noqa: F401
