from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    constrain_model_parallel,
    local_device_count,
    make_mesh,
    put_batch,
    replicated,
    shard_batch_specs,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "constrain_model_parallel",
    "local_device_count",
    "make_mesh",
    "put_batch",
    "replicated",
    "shard_batch_specs",
]
