from ti_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    parallel_sampler,
    parallel_update,
    lane_parallel_sampler,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "parallel_sampler",
    "parallel_update",
    "lane_parallel_sampler",
]
