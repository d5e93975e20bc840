from .mesh import (
    make_mesh,
    maybe_init_distributed,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
    allgather_ragged,
)

__all__ = [
    "make_mesh", "maybe_init_distributed", "shard_batch", "replicate",
    "batch_sharding", "replicated_sharding", "allgather_ragged",
]
