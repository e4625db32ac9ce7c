"""AOT model export: StableHLO artifacts via jax.export.

The TPU-native replacement for the reference's deploy chain
(tools/export_onnx.py torch.onnx -> tools/build_engine.py TensorRT ->
src/infer/onnx_runtime.py): one serialized StableHLO artifact with an
optional symbolic batch dimension (the reference exports dynamic batch,
export_onnx.py:18-137), plus a thin runner mirroring ONNXSegRunner's
interface (src/infer/onnx_runtime.py:7-23).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def export_model(model_path: str, output: str, arch: str = "nested_unet",
                 input_size: int = 512, batch: Optional[int] = None,
                 num_classes: Optional[int] = None) -> str:
    """Load a checkpoint (.pth or orbax), wrap the eval forward, export to a
    serialized StableHLO artifact at `output`. batch=None exports a symbolic
    batch dimension."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from unet_tpu.cli.main import _build_model
    from unet_tpu.core.checkpoint import load_model_variables

    variables, info = load_model_variables(model_path)
    n_cls = num_classes or info.get("num_classes", 3)
    if info.get("kind") == "simple_unet":
        arch = "simple_unet"
    model = _build_model(n_cls, arch, "float32")

    def forward(x):
        out = model.apply(variables, x, train=False)
        return out[0] if isinstance(out, (list, tuple)) else out

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        in_shape = jax.ShapeDtypeStruct((b, input_size, input_size, 3), jnp.float32)
    else:
        in_shape = jax.ShapeDtypeStruct((batch, input_size, input_size, 3), jnp.float32)

    exported = jexport.export(jax.jit(forward))(in_shape)
    blob = exported.serialize()
    out_path = Path(output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(blob)
    print(f"exported {arch} ({n_cls} classes, input {input_size}, "
          f"batch={'dynamic' if batch is None else batch}) -> {out_path} "
          f"({len(blob)} bytes)")
    return str(out_path)


def _outputs_to_tree(out) -> dict:
    """FrameOutputs -> plain nested dict of arrays (drop None fields), so the
    serialized artifact's pytree needs no custom classes at load time."""
    tree = {}
    for k, v in out._asdict().items():
        if v is None:
            continue
        tree[k] = v._asdict() if hasattr(v, "_asdict") else v
    return tree


def export_pipeline(model_path: Optional[str], output: str,
                    preset: str = "two_stage", batch: Optional[int] = None,
                    frame_hw=(448, 800), arch: str = "nested_unet",
                    num_classes: Optional[int] = None, fast: bool = True,
                    cfg=None, variables=None, model=None) -> str:
    """Export the FULL fused pipeline step — preprocess + forward + burr +
    stats/geometry (stages.run_pipeline) — as one StableHLO artifact with an
    optional symbolic batch dim. This is the deploy artifact the reference's
    ONNX chain could never produce: tools/export_onnx.py:18-137 exports the
    bare model forward, reintroducing the per-frame host OpenCV round-trip;
    here the artifact computes frames_u8 -> verdict stats end to end.

    Weights are baked into the artifact (closure constants). `cfg`/`variables`/
    `model` may be passed directly (tests); otherwise they come from
    `model_path` + `preset`."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from unet_tpu.pipeline import get_preset, stages

    if cfg is None:
        from unet_tpu.cli.main import _build_model
        from unet_tpu.core.checkpoint import load_model_variables

        variables, info = load_model_variables(model_path)
        n_cls = num_classes or info.get("num_classes", 3)
        if info.get("kind") == "simple_unet":
            arch = "simple_unet"
        model = _build_model(n_cls, arch, "float32")
        cfg = get_preset(preset)
        if n_cls != cfg.segment.num_classes:
            cfg = cfg.replace_in("segment", num_classes=n_cls)
        if fast and arch == "nested_unet":
            cfg = cfg.replace_in("segment", fast_forward=True)

    def step(frames_u8):
        out = stages.run_pipeline(variables, frames_u8, model=model, cfg=cfg)
        return _outputs_to_tree(out)

    h, w = frame_hw
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        in_shape = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    else:
        in_shape = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)

    exported = jexport.export(jax.jit(step))(in_shape)
    blob = exported.serialize()
    out_path = Path(output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(blob)
    print(f"exported pipeline {cfg.name} (frames {h}x{w}, "
          f"batch={'dynamic' if batch is None else batch}) -> {out_path} "
          f"({len(blob)} bytes)")
    return str(out_path)


class AotRunner:
    """Thin runner over a serialized artifact (ONNXSegRunner equivalent,
    reference src/infer/onnx_runtime.py:7-23): feed normalized NHWC float32,
    get logits."""

    def __init__(self, path: str):
        from jax import export as jexport

        self.exported = jexport.deserialize(Path(path).read_bytes())

    def run(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.exported.call(x))

    def run_tree(self, x: np.ndarray):
        """For pipeline artifacts (export_pipeline): returns the nested dict
        of numpy outputs {class_map, cable_px, ..., diameters: {...}}."""
        import jax
        return jax.tree.map(np.asarray, self.exported.call(x))
