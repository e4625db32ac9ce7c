"""Device mesh runtime: data + spatial parallelism for the inspection stack.

The reference is strictly single-GPU (SURVEY §2.2 — no DDP/NCCL anywhere);
this module is the TPU-native scaling layer it never had:

  * `data` axis   — frames/batch sharding (DP): multi-stream inference and
                    gradient all-reduce training over ICI
  * `spatial` axis — H-dimension sharding of activations (the CNN analogue of
                    sequence/context parallelism) for native-res frames
                    (e.g. the 2448x2048 path, reference
                    infer_high_res_custom_roi.py) — XLA GSPMD inserts the
                    conv halo exchanges automatically once inputs carry a
                    spatial sharding

Collectives ride ICI via jit-over-NamedSharding; nothing here hand-rolls
transport (SURVEY §5 'Distributed communication backend').
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """(data, spatial) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        raise ValueError(f"{n_data}x{n_spatial} mesh != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """(B, H, W, C) images: batch on `data`, H on `spatial`."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS if spatial else None))


def label_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS if spatial else None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh, spatial: bool = True):
    """jit the (state, images, labels) train step over the mesh: batch sharded
    on data(+spatial), state replicated. XLA turns the param gradients into
    ICI all-reduces and conv edges into halo exchanges."""
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, batch_sharding(mesh, spatial), label_sharding(mesh, spatial)),
        out_shardings=(rep, rep),
    )


def shard_eval_step(eval_step, mesh: Mesh, spatial: bool = True):
    """Sharded eval returning a replicated confusion matrix (the cross-chip
    metric reduction is one psum XLA inserts for the scatter-add)."""
    rep = replicated(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(rep, batch_sharding(mesh, spatial), label_sharding(mesh, spatial)),
        out_shardings=rep,
    )


def shard_pipeline_step(step_fn, mesh: Mesh, spatial: bool = False):
    """Shard the fused inference pipeline over the data axis (multi-stream
    batched serving, BASELINE config 5) and optionally the frame H axis
    (`spatial=True`, the native-res path — GSPMD inserts conv halo
    exchanges over ICI)."""
    rep = replicated(mesh)
    frames_s = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS if spatial else None))
    return jax.jit(step_fn, in_shardings=(rep, frames_s))


def put_batch(mesh: Mesh, images, labels=None, spatial: bool = True):
    """Host arrays -> device-sharded arrays. Under multi-host (DCN) execution
    the inputs are this process's local batch slice (multihost.
    ProcessShardedLoader) and assemble into one global array; single-host
    inputs are the full batch."""
    if jax.process_count() > 1:
        from unet_tpu.parallel import multihost
        return multihost.global_put_batch(mesh, images, labels, spatial)
    im = jax.device_put(images, batch_sharding(mesh, spatial))
    if labels is None:
        return im
    return im, jax.device_put(labels, label_sharding(mesh, spatial))
