from detr_tpu.parallel.distributed import (
    allgather_host,
    data_shard,
    initialize_distributed,
    is_primary,
    process_count,
    process_index,
)
from detr_tpu.parallel.mesh import (
    assert_divisible,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)
from detr_tpu.parallel.tp import (
    make_mesh_2d,
    param_specs,
    shard_state_tp,
    validate_tp,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "param_specs",
    "shard_state_tp",
    "validate_tp",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "shard_state",
    "assert_divisible",
    "initialize_distributed",
    "is_primary",
    "process_index",
    "process_count",
    "data_shard",
    "allgather_host",
]
