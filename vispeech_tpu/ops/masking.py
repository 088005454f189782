"""Masking, slicing and path utilities (reference commons.py:48-161).

All functions are jit-safe: static shapes, no data-dependent control flow.
Layout convention: sequences [B, T, C], masks [B, T, 1] float.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] lengths → [B, T] bool mask (reference commons.py:121-125)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def length_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths → [B, T, 1] float mask."""
    return sequence_mask(lengths, max_length)[..., None].astype(dtype)


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Gather fixed-size time segments: x [B, T, C], ids [B] → [B, S, C]
    (reference commons.py:48-54)."""

    def take(xb, start):
        return jax.lax.dynamic_slice_in_dim(xb, start, segment_size, axis=0)

    return jax.vmap(take)(x, ids_str)


def rand_slice_segments(
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    segment_size: int,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random per-utterance segment slice (reference commons.py:57-64).

    Keeps the segment inside the valid length; utterances shorter than
    segment_size start at 0 (the data pipeline filters those out in training).
    """
    B, T, _ = x.shape
    if lengths is None:
        lengths = jnp.full((B,), T)
    max_start = jnp.maximum(lengths - segment_size, 0)
    u = jax.random.uniform(rng, (B,))
    ids = (u * (max_start + 1).astype(u.dtype)).astype(jnp.int32)
    ids = jnp.minimum(ids, jnp.maximum(T - segment_size, 0))
    return slice_segments(x, ids, segment_size), ids


def intersperse(seq, item):
    """Python-side blank interleaving (reference commons.py:24-27)."""
    out = [item] * (len(seq) * 2 + 1)
    out[1::2] = seq
    return out


def subsequent_mask(length: int) -> jnp.ndarray:
    """[1, 1, T, T] lower-triangular causal mask (reference commons.py:95-97)."""
    return jnp.tril(jnp.ones((length, length)))[None, None]


def generate_path(duration: jnp.ndarray, t_frames: int) -> jnp.ndarray:
    """Duration [B, N] → hard alignment path [B, T, N] (monotonic expansion).

    path[b, t, n] = 1 iff frame t belongs to phoneme n, i.e.
    cum[n-1] <= t < cum[n].  This is the device-side replacement for the
    reference's serial, host-side LengthRegulator loop (models.py:390-432) and
    for generate_path (commons.py:128-143): expansion becomes a single
    [B,T,N] × [B,N,C] matmul on the MXU.
    """
    ends = jnp.cumsum(duration, axis=1)  # [B, N]
    starts = ends - duration
    t = jnp.arange(t_frames, dtype=ends.dtype)[None, :, None]  # [1, T, 1]
    path = (t >= starts[:, None, :]) & (t < ends[:, None, :])
    return path


def grad_global_norm(grads) -> jnp.ndarray:
    """L2 norm across a gradient pytree — the reference logs this via
    clip_grad_value_(…, None) without clipping (commons.py:146-161)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
