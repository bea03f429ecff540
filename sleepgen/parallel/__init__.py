from sleepgen.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
