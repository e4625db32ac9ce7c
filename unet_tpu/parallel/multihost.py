"""Multi-host (DCN) scaffolding: process init + per-process data sharding +
host-local -> global batch assembly.

Single-host multi-chip rides ICI via the (data, spatial) mesh (mesh.py);
this layer adds the pod-slice dimension the reference never had (it is
single-GPU, SURVEY §2.2): every host runs the same program, loads only its
1/P slice of each global batch, and the slices are assembled into one global
jax.Array whose data-axis sharding spans hosts — gradient all-reduce then
rides ICI within a host and DCN across hosts, both inserted by XLA.

Usage (same script on every host):

    from unet_tpu import parallel
    parallel.multihost.initialize()          # no-op on a single process
    mesh = parallel.make_mesh()              # global: all processes' devices
    loader = parallel.multihost.ProcessShardedLoader(base_loader)
    for images, labels in loader:            # host-local (B/P, ...) slices
        im, lb = parallel.put_batch(mesh, images, labels)   # global arrays
        state, metrics = sharded_train_step(state, im, lb)
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Best-effort jax.distributed.initialize.

    * On TPU pods, jax.distributed auto-detects everything from the metadata
      server — call with no args.
    * Elsewhere, args or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
      JAX_PROCESS_ID env vars configure the cluster.
    * Single process (nothing configured) or already-initialized: no-op.

    Returns (process_index, process_count)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    already = jax._src.distributed.global_state.client is not None  # noqa: SLF001
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


class ProcessShardedLoader:
    """Wraps a data.Loader so each process yields its contiguous 1/P slice of
    every GLOBAL batch. The index stream is identical on every process (the
    base loader's rng is seed-deterministic), so slice p of batch k holds the
    same samples everywhere; each host only pays decode/augment cost for its
    own slice via dataset indexing.

    The base loader's batch_size is the GLOBAL batch; it must be divisible by
    process_count. Ragged final batches are dropped (shards must stay equal).
    """

    def __init__(self, loader, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        import jax

        self.loader = loader
        self.pid = jax.process_index() if process_index is None else process_index
        self.pcount = jax.process_count() if process_count is None else process_count
        if loader.batch_size % self.pcount:
            raise ValueError(
                f"global batch {loader.batch_size} not divisible by "
                f"{self.pcount} processes")
        self.batch_size = loader.batch_size  # global, for schedule sizing
        self.local_batch = loader.batch_size // self.pcount
        self.dataset = getattr(loader, "dataset", None)

    def __len__(self):
        n = len(self.loader.dataset)
        return n // self.loader.batch_size  # drop_last semantics

    def __iter__(self):
        k = self.local_batch
        # replicate the base loader's index stream WITHOUT loading samples:
        # same rng consumption as Loader._indices on every process
        ld = self.loader
        idx = ld._indices()
        for s in range(0, len(idx), ld.batch_size):
            chunk = idx[s:s + ld.batch_size]
            if len(chunk) < ld.batch_size:
                return
            mine = chunk[self.pid * k:(self.pid + 1) * k]
            imgs, masks = zip(*(ld.dataset[int(i)] for i in mine))
            yield np.stack(imgs), np.stack(masks)


def global_put_batch(mesh, images, labels=None, spatial: bool = True):
    """Host-local (B/P, ...) numpy slices -> ONE global jax.Array batch whose
    data axis spans all processes' devices. On a single process this equals
    plain device_put sharding."""
    import jax

    from unet_tpu.parallel import mesh as _m

    im_sh = _m.batch_sharding(mesh, spatial)
    im = jax.make_array_from_process_local_data(im_sh, np.asarray(images))
    if labels is None:
        return im
    lb = jax.make_array_from_process_local_data(
        _m.label_sharding(mesh, spatial), np.asarray(labels))
    return im, lb
