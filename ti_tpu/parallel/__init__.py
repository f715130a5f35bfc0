from ti_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    parallel_sampler,
    parallel_update,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "parallel_sampler",
    "parallel_update",
]
