"""Mesh / sharding runtime (DP + spatial parallelism over ICI, DCN scaffolding)."""
from unet_tpu.parallel import multihost  # noqa: F401
from unet_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, SPATIAL_AXIS, make_mesh, batch_sharding, replicated,
    shard_train_step, shard_eval_step, shard_pipeline_step, put_batch)
