"""Unified config serialization + reference-format migration.

The reference ships three overlapping config systems (SURVEY §5): per-CLI
argparse, `AppCfg` yaml (src/utils/config.py:12-107), and `RefactorConfig`
(src/refactor/config.py:11-157). Here PipelineCfg (pipeline.config) is the
single typed tree; this module gives it YAML round-trip plus loaders that
accept the two legacy YAML layouts so existing deployment configs migrate
without editing.
"""
from __future__ import annotations

import dataclasses
import os
import tempfile
from pathlib import Path
from typing import Any, Dict


def jax_cache_dir() -> str:
    """Persistent-compile-cache location: user-scoped by default (a fixed
    world-writable /tmp path would let another local user pre-create and
    poison the directory whose compiled artifacts JAX loads and executes);
    UNET_TPU_JAX_CACHE overrides."""
    override = os.environ.get("UNET_TPU_JAX_CACHE")
    if override:
        return override
    uid = os.getuid() if hasattr(os, "getuid") else "u"
    return os.path.join(tempfile.gettempdir(), f"unet_tpu_jax_cache_{uid}")


def enable_compilation_cache() -> None:
    """Best-effort persistent JAX compilation cache (512^2 graphs compile in
    tens of seconds cold; cached reloads are near-instant)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization, never a hard requirement

from unet_tpu.pipeline.config import (ROI, BurrCfg, GeometryCfg, PipelineCfg,
                                      PostprocessCfg, PreprocessCfg, SegmentCfg)

_SECTIONS = {"preprocess": PreprocessCfg, "segment": SegmentCfg,
             "burr": BurrCfg, "postprocess": PostprocessCfg,
             "geometry": GeometryCfg}


def _dc_to_dict(obj) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _dc_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def pipeline_cfg_to_dict(cfg: PipelineCfg) -> Dict[str, Any]:
    return _dc_to_dict(cfg)


def pipeline_cfg_from_dict(data: Dict[str, Any]) -> PipelineCfg:
    kw: Dict[str, Any] = {}
    for key, cls in _SECTIONS.items():
        if key in data and data[key] is not None:
            section = dict(data[key])
            for f in dataclasses.fields(cls):
                if f.name in section and isinstance(section[f.name], list):
                    section[f.name] = tuple(section[f.name])
            kw[key] = cls(**section)
    if data.get("roi"):
        r = dict(data["roi"])
        if isinstance(r.get("space"), list):
            r["space"] = tuple(r["space"])
        kw["roi"] = ROI(**r)
    for scalar in ("name", "batch"):
        if scalar in data:
            kw[scalar] = data[scalar]
    return PipelineCfg(**kw)


def save_pipeline_yaml(cfg: PipelineCfg, path: str) -> None:
    import yaml
    Path(path).write_text(yaml.safe_dump(pipeline_cfg_to_dict(cfg),
                                         default_flow_style=False))


def load_pipeline_yaml(path: str) -> PipelineCfg:
    """Load a PipelineCfg YAML — or migrate a legacy AppCfg / RefactorConfig
    layout when its sections are recognized."""
    import yaml
    data = yaml.safe_load(Path(path).read_text()) or {}
    if "camera" in data and "model" in data:
        return migrate_app_cfg(data)
    if "event" in data and "burr" in data and "roi" in data \
            and "x" in (data.get("roi") or {}):
        return migrate_refactor_cfg(data)
    return pipeline_cfg_from_dict(data)


def migrate_app_cfg(data: Dict[str, Any]) -> PipelineCfg:
    """Legacy AppCfg yaml (reference src/utils/config.py:82-107) ->
    PipelineCfg. Camera/mqtt/event sections are consumed by serve/engine
    configs; this maps the model + roi + scale parts."""
    model = data.get("model", {})
    size = model.get("input_size", [512, 512])
    cfg = PipelineCfg(
        name="app_cfg",
        preprocess=PreprocessCfg(model_size=(int(size[0]), int(size[1]))),
        segment=SegmentCfg(num_classes=int(model.get("num_classes", 3))),
        geometry=GeometryCfg(
            enabled=True,
            mm_per_px=float(data.get("scale", {}).get("mm_per_px") or 0.05)),
    )
    roi = data.get("camera", {}).get("roi") or {}
    if roi.get("enabled"):
        x, y, w, h = roi["x"], roi["y"], roi["w"], roi["h"]
        cam_w = data["camera"].get("width", x + w)
        cam_h = data["camera"].get("height", y + h)
        cfg = cfg.replace(roi=ROI(x, y, x + w, y + h, space=(cam_w, cam_h)))
    return cfg


def migrate_refactor_cfg(data: Dict[str, Any]) -> PipelineCfg:
    """Legacy RefactorConfig yaml (reference src/refactor/config.py:110-157)
    -> PipelineCfg (burr: laplacian method; postprocess shape constraints)."""
    burr = data.get("burr", {})
    post = data.get("postprocess", {})
    roi = data.get("roi", {})
    cfg = PipelineCfg(
        name="refactor_cfg",
        burr=BurrCfg(method="laplacian",
                     band_px=int(burr.get("band_out", 10)),
                     laplacian_thresh=float(burr.get("laplacian_threshold", 30)),
                     min_area=int(burr.get("min_area", 20)),
                     max_area=int(burr.get("max_area", 500))),
        postprocess=PostprocessCfg(
            enabled=True,
            cable_min_area=int(post.get("cable_min_area", 1000)),
            cable_min_aspect=float(post.get("cable_min_aspect", 1.6)),
            cable_max_center_offset=float(post.get("cable_max_center_offset", 0.3)),
            tape_ring_dilate=int(post.get("tape_ring_dilate", 15)),
            tape_ring_erode=int(post.get("tape_ring_erode", 5))),
        geometry=GeometryCfg(enabled=True),
    )
    if roi and "x" in roi:
        x, y, w, h = roi["x"], roi["y"], roi.get("w", 640), roi.get("h", 480)
        cfg = cfg.replace(roi=ROI(x, y, x + w, y + h, space=(x + w, y + h)))
    return cfg
