"""PyTorch checkpoint -> Flax variables converter.

The reference publishes three checkpoint families (SURVEY §2.3 / §5):
  * NestedUNet (custom encoder)  — keys like `conv0_0.conv1.weight`
    (reference src/models/unetpp.py:49-91)
  * NestedUNet (resnet50 encoder) — `conv0_0.0.weight`, `conv1_0.<i>.conv1.*`
  * SimpleUNet — `enc1.0.weight`, `up3.weight`, `dec3.2.bias`
    (reference src/models/simple_unet.py:1-17 documents the key layout)

This module maps those layouts onto the Flax module trees in models.unetpp /
models.simple_unet so quality parity is measurable against the real .pth
files. Checkpoint containers may be the rich dict {epoch, model, optimizer,
scheduler, best_mIoU, config}, {model_state_dict: ...}, or a bare state dict
(the reference's loaders accept all three, infer_video.py:147-153).

No torch dependency at convert time: inputs are {key: np.ndarray}. Use
`load_torch_checkpoint` (lazy torch import) to read a .pth into that form.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth into {key: np.ndarray}, unwrapping the known containers."""
    import torch  # lazy: only needed when actually converting

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "model_state_dict", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) -> flax HWIO (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose with
    transpose_kernel=True, which stores (kh, kw, O, I) and flips spatially —
    exactly the gradient-of-conv convention torch uses."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_conv(params, path, sd, tk):
    _set(params, path + ("kernel",), _conv_w(sd[tk + ".weight"]))
    if tk + ".bias" in sd:
        _set(params, path + ("bias",), sd[tk + ".bias"])


def _map_bn(params, stats, path, sd, tk):
    _set(params, path + ("scale",), sd[tk + ".weight"])
    _set(params, path + ("bias",), sd[tk + ".bias"])
    _set(stats, path + ("mean",), sd[tk + ".running_mean"])
    _set(stats, path + ("var",), sd[tk + ".running_var"])


def _map_convblock(params, stats, path, sd, tk):
    _map_conv(params, path + ("conv1",), sd, tk + ".conv1")
    _map_bn(params, stats, path + ("bn1",), sd, tk + ".bn1")
    _map_conv(params, path + ("conv2",), sd, tk + ".conv2")
    _map_bn(params, stats, path + ("bn2",), sd, tk + ".bn2")


def detect_model_kind(sd: Dict[str, np.ndarray]) -> str:
    if "conv0_0.conv1.weight" in sd:
        return "nested_unet"
    if "conv0_0.0.weight" in sd:
        return "nested_unet_resnet50"
    if "enc1.0.weight" in sd:
        return "simple_unet"
    raise ValueError("unrecognized checkpoint key layout")


def infer_num_classes(sd: Dict[str, np.ndarray]) -> int:
    """Output classes from the final 1x1 conv — the reference's
    auto-num-classes trick (infer_video_refactored.py:59)."""
    return int(sd["final.weight"].shape[0])


def convert_state_dict(sd: Dict[str, np.ndarray], kind: str | None = None) -> Dict[str, Any]:
    """state dict -> {"params": ..., "batch_stats": ...} for the Flax model."""
    kind = kind or detect_model_kind(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if kind == "nested_unet":
        for name in ("conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0",
                     "conv3_1", "conv2_2", "conv1_3", "conv0_4"):
            _map_convblock(params, stats, (name,), sd, name)
        _map_conv(params, ("final",), sd, "final")
        for ds in ("ds3_1", "ds2_2", "ds1_3"):
            if ds + ".weight" in sd:
                _map_conv(params, (ds,), sd, ds)

    elif kind == "nested_unet_resnet50":
        enc = ("encoder",)
        _map_conv(params, enc + ("stem", "conv1"), sd, "conv0_0.0")
        _map_bn(params, stats, enc + ("stem", "bn1"), sd, "conv0_0.1")
        stage_blocks = {"conv1_0": ("layer1", 3), "conv2_0": ("layer2", 4),
                        "conv3_0": ("layer3", 6), "conv4_0": ("layer4", 3)}
        for tk_stage, (fx_stage, n) in stage_blocks.items():
            for i in range(n):
                base = f"{tk_stage}.{i}"
                path = enc + (f"{fx_stage}_{i}",)
                for conv, bn in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
                    _map_conv(params, path + (conv,), sd, f"{base}.{conv}")
                    _map_bn(params, stats, path + (bn,), sd, f"{base}.{bn}")
                if f"{base}.downsample.0.weight" in sd:
                    _map_conv(params, path + ("downsample_conv",), sd, f"{base}.downsample.0")
                    _map_bn(params, stats, path + ("downsample_bn",), sd, f"{base}.downsample.1")
        for name in ("conv3_1", "conv2_2", "conv1_3", "conv0_4"):
            _map_convblock(params, stats, (name,), sd, name)
        _map_conv(params, ("final",), sd, "final")
        for ds in ("ds3_1", "ds2_2", "ds1_3"):
            if ds + ".weight" in sd:
                _map_conv(params, (ds,), sd, ds)

    elif kind == "simple_unet":
        for name in ("enc1", "enc2", "enc3", "enc4", "dec3", "dec2", "dec1"):
            _map_conv(params, (name, "conv1"), sd, f"{name}.0")
            _map_conv(params, (name, "conv2"), sd, f"{name}.2")
        for name in ("up3", "up2", "up1"):
            _set(params, (name, "kernel"), _convT_w(sd[name + ".weight"]))
            _set(params, (name, "bias"), sd[name + ".bias"])
        _map_conv(params, ("final",), sd, "final")
    else:
        raise ValueError(f"unknown model kind {kind!r}")

    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_checkpoint(path: str, kind: str | None = None) -> Dict[str, Any]:
    """Load + convert a torch .pth into Flax variables."""
    return convert_state_dict(load_torch_checkpoint(path), kind)


def convert_mobilenet_encoder(sd: Dict[str, np.ndarray], variant: str = "small",
                              torch_prefix: str = "") -> Dict[str, Any]:
    """torchvision mobilenet_v3_{small,large} features.* state dict ->
    Flax MobileNetV3Encoder variables (models.mobilenet). Supports the
    ImageNet-pretrained encoder option of LightweightNestedUNet
    (reference unetpp_lightweight.py:122-151)."""
    from unet_tpu.models.mobilenet import LARGE_SPEC, SMALL_SPEC

    spec = SMALL_SPEC if variant == "small" else LARGE_SPEC
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    pf = torch_prefix

    def cna(flax_path, tk_conv, tk_bn):
        _set(params, flax_path + ("conv", "kernel"), _conv_w(sd[tk_conv + ".weight"]))
        _map_bn(params, stats, flax_path + ("bn",), sd, tk_bn)

    cna(("features_0",), f"{pf}features.0.0", f"{pf}features.0.1")
    in_ch = 16
    for i, (k, exp, out, use_se, act, stride) in enumerate(spec):
        idx = i + 1
        base = f"{pf}features.{idx}.block"
        path = (f"features_{idx}",)
        j = 0
        if exp != in_ch:
            cna(path + ("expand",), f"{base}.{j}.0", f"{base}.{j}.1")
            j += 1
        cna(path + ("depthwise",), f"{base}.{j}.0", f"{base}.{j}.1")
        j += 1
        if use_se:
            _map_conv(params, path + ("se", "fc1"), sd, f"{base}.{j}.fc1")
            _map_conv(params, path + ("se", "fc2"), sd, f"{base}.{j}.fc2")
            j += 1
        _set(params, path + ("project_conv", "kernel"),
             _conv_w(sd[f"{base}.{j}.0.weight"]))
        _map_bn(params, stats, path + ("project_bn",), sd, f"{base}.{j}.1")
        in_ch = out
    last_idx = len(spec) + 1
    cna((f"features_{last_idx}",), f"{pf}features.{last_idx}.0",
        f"{pf}features.{last_idx}.1")
    return {"params": params, "batch_stats": stats}
