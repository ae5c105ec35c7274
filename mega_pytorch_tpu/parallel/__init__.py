from .mesh import (
    batch_sharding,
    make_mesh,
    make_train_step,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_train_step",
    "replicate",
    "replicated",
    "shard_batch",
]
