"""Checkpoint save / resume (reference utils.py:21-89 redesigned for TPU).

Checkpoints are stored as a flat ``{tree-path: ndarray}`` mapping in a single
``.npz`` per step.  Path-keyed flat storage makes the reference's semantics
exact and trivial:

- step-numbered checkpoints (``ckpt_{step}.npz``, reference ``G_{step}.pth``);
- **tolerant partial load** — every leaf whose tree path + shape matches the
  current state is restored, everything else keeps its fresh-init value (the
  reference's key-wise fallback load, utils.py:33-43) so fine-tuning with
  grown/shrunk modules works;
- ``skip_optimizer`` for fine-tuning with frozen parts (utils.py:26,45);
- automatic pruning of stale checkpoints, keeping the newest ``keep``
  (utils.py:54-59 deletes the checkpoint from 2 eval-intervals ago);
- resume = restore at ``latest_checkpoint_step`` (utils.py:84-89's glob-max).

The whole TrainState (G params, D params, both optimizer states, RNG, step)
is one checkpoint — there is no G/D file split to keep in sync.  Writes are
atomic (tmp + rename) so a preempted save never corrupts the resume point.

Multi-host / tensor-parallel: ``save_checkpoint`` first runs
``gather_state_to_host`` — one jitted identity whose outputs are replicated
over the state's mesh, so GSPMD all-gathers TP-sharded parameters across
hosts (a COLLECTIVE: every process must call save_checkpoint) — then only
process 0 writes the assembled arrays.  ``load_checkpoint`` accepts a
``shardings`` pytree to place restored leaves straight back under their
TP/replicated shardings.
"""

from __future__ import annotations

import logging
import os
import re
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

logger = logging.getLogger("vispeech_tpu")

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.npz$")


def _path_str(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def flatten_state(state: Any) -> Dict[str, np.ndarray]:
    """Flatten any pytree (flax structs, optax NamedTuples, dicts) to
    {path: host ndarray}."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    return {_path_str(kp): np.asarray(jax.device_get(v)) for kp, v in leaves}


def _state_mesh(state: Any):
    """The NamedSharding mesh the state lives on, or None if unsharded."""
    for leaf in jax.tree_util.tree_leaves(state):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.size > 1:
            return sh.mesh
    return None


def gather_state_to_host(state: Any) -> Any:
    """Replicate every leaf over the state's mesh (GSPMD all-gather of
    TP-sharded params, cross-host over DCN when the mesh spans hosts) so each
    process holds a full copy.  One jitted identity — one compile per state
    signature, cached thereafter.  No-op for unsharded state."""
    mesh = _state_mesh(state)
    if mesh is None:
        return state
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(lambda t: t, out_shardings=rep)(state)


def _ckpt_path(base_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(base_dir), f"ckpt_{step}.npz")


def save_checkpoint(base_dir: str, state: Any, step: int, keep: int = 2) -> str:
    """Save the full train state at `step`; prune to the newest `keep`.

    COLLECTIVE under a multi-device/multi-host mesh: every process must call
    it (the host-gather all-gathers TP shards); only process 0 writes.
    """
    path = _ckpt_path(base_dir, step)
    state = gather_state_to_host(state)
    if jax.process_index() != 0:
        return path
    os.makedirs(os.path.abspath(base_dir), exist_ok=True)
    flat = flatten_state(state)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    logger.info("Saved checkpoint at step %d -> %s (%d arrays)", step, path, len(flat))
    prune_checkpoints(base_dir, keep=keep)
    return path


def list_checkpoint_steps(base_dir: str):
    if not os.path.isdir(base_dir):
        return []
    steps = []
    for name in os.listdir(base_dir):
        m = _CKPT_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint_step(base_dir: str) -> Optional[int]:
    """Largest saved step, or None (reference utils.py:84-89)."""
    steps = list_checkpoint_steps(base_dir)
    return steps[-1] if steps else None


def prune_checkpoints(base_dir: str, keep: int = 2) -> None:
    """Delete all but the newest `keep` checkpoints (utils.py:54-59)."""
    steps = list_checkpoint_steps(base_dir)
    for step in steps[:-keep] if keep > 0 else steps:
        path = _ckpt_path(base_dir, step)
        try:
            os.remove(path)
            logger.info("Pruned stale checkpoint %s", path)
        except OSError:
            pass


class AsyncCheckpointer:
    """Preemption-safe asynchronous checkpointing.

    ``save`` performs the *collective* part synchronously — the TP host-gather
    (every process participates) and the device→host copy, so the snapshot is
    consistent even though training mutates the state immediately after — then
    hands the serialization + atomic rename + prune to a single background
    thread and returns.  Training overlaps the file write (the dominant cost:
    ~1 GB of npz for the flagship state) instead of stalling the step loop.

    Semantics follow orbax's AsyncCheckpointer: at most one write in flight
    (a new ``save`` first waits for the previous one); ``wait()`` blocks until
    the pending write is durable; an error in the background write is
    re-raised at the next ``save``/``wait`` so failures are never silent.
    Only process 0 writes; other processes return after the gather.
    """

    def __init__(self, keep: int = 2):
        self.keep = keep
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, base_dir: str, state: Any, step: int) -> str:
        self.wait()
        path = _ckpt_path(base_dir, step)
        state = gather_state_to_host(state)
        if jax.process_index() != 0:
            return path
        flat = flatten_state(state)  # device→host copy: snapshot is immutable

        def _write():
            try:
                os.makedirs(os.path.abspath(base_dir), exist_ok=True)
                tmp = path + ".tmp.npz"
                with open(tmp, "wb") as f:
                    np.savez(f, **flat)
                os.replace(tmp, path)
                logger.info(
                    "Saved checkpoint at step %d -> %s (%d arrays, async)",
                    step, path, len(flat),
                )
                prune_checkpoints(base_dir, keep=self.keep)
            except BaseException as e:  # re-raised on the training thread
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-write-{step}", daemon=True
        )
        self._thread.start()
        return path

    def wait(self) -> None:
        """Block until the in-flight write (if any) is durable on disk."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err


def load_checkpoint(
    base_dir: str,
    state: Any,
    step: Optional[int] = None,
    skip_optimizer: bool = False,
    shardings: Any = None,
) -> Tuple[Any, Optional[int]]:
    """Restore into `state` tolerantly; returns (state, restored_step).

    Every leaf of `state` whose path exists in the checkpoint with a matching
    shape takes the stored value; all others keep their current (fresh-init)
    values with a warning — the reference's shape-tolerant key-wise load
    (utils.py:33-43).  With ``skip_optimizer``, leaves under ``opt_state*``
    are left untouched (utils.py:45-51).  ``shardings`` (a pytree matching
    `state`, e.g. from parallel.param_shardings) re-places every restored
    leaf under its TP/replicated sharding (each process reads the file —
    shared-FS assumption, same as orbax's default).
    """
    if step is None:
        step = latest_checkpoint_step(base_dir)
    if step is None:
        return state, None
    path = _ckpt_path(base_dir, step)
    stored = np.load(path)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    new_leaves = []
    n_hit = 0
    for kp, cur in leaves:
        p = _path_str(kp)
        cur_np = np.asarray(jax.device_get(cur))
        if skip_optimizer and p.startswith("opt_state"):
            new_leaves.append(cur)
            continue
        if p not in stored.files:
            logger.warning("ckpt: %s missing in checkpoint; keeping init", p)
            new_leaves.append(cur)
            continue
        val = stored[p]
        if val.shape != cur_np.shape:
            logger.warning(
                "ckpt: %s shape mismatch %s vs %s; keeping init",
                p, val.shape, cur_np.shape,
            )
            new_leaves.append(cur)
            continue
        new_leaves.append(val.astype(cur_np.dtype))
        n_hit += 1
    new_state = jax.tree_util.tree_unflatten(
        treedef, [v for v in new_leaves]
    )
    if shardings is not None:
        new_state = jax.tree_util.tree_map(jax.device_put, new_state, shardings)
    logger.info(
        "Restored checkpoint step %s from %s (%d/%d leaves)",
        step, path, n_hit, len(leaves),
    )
    return new_state, step
