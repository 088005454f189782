"""Device mesh and sharding rules (the reference's parallelism is NCCL DDP,
train.py:44-106; here it becomes GSPMD sharding annotations over a
('data', 'model') mesh — collectives are compiler-inserted and ride ICI).

Strategy:
  * batch axis → 'data' (pure DP, the reference's only parallelism)
  * large channel dimensions (vocoder/flow/WN conv kernels, embeddings) →
    'model' when divisible, giving tensor parallelism for stacks that exceed
    one chip; everything else replicated
  * multi-host: call jax.distributed.initialize() before make_mesh; the mesh
    spans all processes' devices, per-host data loading shards on 'data'
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter path patterns whose *last* (output-channel) dim shards on 'model';
# these are the stacks that dominate memory/compute (vocoder + WN)
_MODEL_SHARDED_PATTERNS = (
    r".*dec.*(up_\d+|res_\d+_\d+|conv_pre).*\bv\b",
    r".*dec.*(up_\d+|res_\d+_\d+|conv_pre).*kernel",
    r".*enc_q.*in_\d+.*\bv\b",
    r".*flow.*in_\d+.*\bv\b",
)
_MIN_SHARD_SIZE = 64  # don't bother sharding tiny params


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over all devices (default: data = all)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}×{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host-local [B, ...] arrays with B sharded on 'data'.

    Single-host: plain device_put with a NamedSharding.  Multi-host: each
    process passes its local shard and the global array is assembled with
    make_array_from_process_local_data (B_global = B_local × process_count).
    """
    multihost = jax.process_count() > 1

    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multihost:  # executed under 2 CPU processes in tests/test_multihost.py
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_shardings(params: Any, mesh: Mesh, require_match: bool = False) -> Any:
    """Sharding tree for params: model-parallel channel sharding where the
    pattern matches and the dim divides, replicated otherwise.

    ``require_match=True`` (use for the generator tree): raise if a model
    axis >1 is requested but NO parameter matches — a renamed module must
    fail loudly, not silently degrade TP to replication
    (tests/test_sharding.py pins the expected matches).  Leave False for
    trees with no TP-targeted stacks (e.g. the discriminators).
    """
    model_size = mesh.shape["model"]
    n_matched = 0

    def rule(path, x):
        nonlocal n_matched
        if model_size > 1 and hasattr(x, "ndim") and x.ndim >= 1:
            p = _path_str(path)
            for pat in _MODEL_SHARDED_PATTERNS:
                if re.fullmatch(pat, p) or re.match(pat, p):
                    if x.shape[-1] % model_size == 0 and x.shape[-1] >= _MIN_SHARD_SIZE:
                        n_matched += 1
                        spec = [None] * (x.ndim - 1) + ["model"]
                        return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    out = jax.tree_util.tree_map_with_path(rule, params)
    if require_match and model_size > 1 and n_matched == 0:
        raise ValueError(
            "model-parallel mesh requested but no parameter matched the "
            "TP sharding patterns — module paths changed? "
            f"(patterns: {_MODEL_SHARDED_PATTERNS})"
        )
    return out


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
