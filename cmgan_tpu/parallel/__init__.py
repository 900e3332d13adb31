from cmgan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
]
