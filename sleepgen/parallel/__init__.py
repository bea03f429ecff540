from sleepgen.parallel.mesh import (
    DATA_AXIS,
    prefetch_to_device,
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
    "prefetch_to_device",
    "replicate",
    "replicated",
    "shard_batch",
]
