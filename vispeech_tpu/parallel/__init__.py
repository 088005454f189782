"""Distribution: device mesh construction and sharding rules.

Parallelism axes (SURVEY.md §2.8): data/tensor (mesh.py), sequence/context
(context.py — ring attention + overlap-save vocoder), pipeline (pipeline.py
— GPipe stage split of the inference path).
"""

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
