"""Distribution: device mesh construction and sharding rules."""

from vispeech_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
]
