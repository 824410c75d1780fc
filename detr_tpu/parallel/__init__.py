from detr_tpu.parallel.mesh import (
    assert_divisible,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "shard_state",
    "assert_divisible",
]
