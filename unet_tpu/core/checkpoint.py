"""Checkpointing: orbax-backed save/restore with the reference's rich
checkpoint contract plus the torch .pth compatibility shim.

The reference saves {epoch, model, optimizer, scheduler, best_mIoU, config}
and resumes all of it (tools/train.py:329-397); inference loaders accept
`model` / `model_state_dict` / bare state dicts (infer_video.py:147-153).
Here: orbax StandardCheckpointer for the pytrees + a JSON sidecar for scalars
and config; `load_model_variables` accepts an orbax dir OR a torch .pth
(auto-converted via models.convert), with num_classes auto-detection
(reference load_model_with_auto_classes, infer_video_refactored.py:59).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, *, epoch: int, best_miou: float,
                    config: Optional[dict] = None, name: str = "best") -> str:
    """Persist {params, batch_stats, opt_state, step} + metadata sidecar."""
    import orbax.checkpoint as ocp

    path = (Path(ckpt_dir) / name).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }, force=True)
    meta = {"epoch": epoch, "best_miou": best_miou, "config": config or {}}
    (Path(ckpt_dir) / f"{name}.meta.json").write_text(json.dumps(meta, indent=2))
    return str(path)


def restore_checkpoint(ckpt_dir: str, state, name: str = "best"
                       ) -> Tuple[Any, Dict[str, Any]]:
    """Restore into an abstract-compatible TrainState; returns (state, meta)."""
    import orbax.checkpoint as ocp

    path = (Path(ckpt_dir) / name).resolve()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    meta_path = Path(ckpt_dir) / f"{name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return state, meta


def save_variables(path: str, variables: Dict[str, Any]) -> str:
    """Save inference variables ({params[, batch_stats]}) standalone."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(p, variables, force=True)
    return str(p)


def load_model_variables(path: str, kind: Optional[str] = None
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load inference variables from either a torch .pth (converted) or an
    orbax directory. Returns (variables, info) where info carries
    {"num_classes": ..., "kind": ...} when derivable."""
    from unet_tpu.models import convert

    p = Path(path)
    info: Dict[str, Any] = {}
    if p.is_file() and p.suffix in (".pth", ".pt"):
        sd = convert.load_torch_checkpoint(str(p))
        info["kind"] = kind or convert.detect_model_kind(sd)
        info["num_classes"] = convert.infer_num_classes(sd)
        return convert.convert_state_dict(sd, info["kind"]), info
    if p.is_dir():
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            variables = ckptr.restore(p.resolve())
        variables = jax.tree.map(np.asarray, variables)
        # a TrainState checkpoint carries opt_state/step too; keep only the
        # collections flax .apply accepts
        variables = {k: v for k, v in variables.items()
                     if k in ("params", "batch_stats") and v}
        if "params" in variables and "final" in variables["params"]:
            info["num_classes"] = int(variables["params"]["final"]["bias"].shape[-1])
        return variables, info
    raise FileNotFoundError(f"no checkpoint at {path}")
