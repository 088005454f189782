"""Vectorized, device-side length regulator.

The reference expands phoneme states to frame level with a serial Python loop
that allocates on the CPU mid-graph (reference models.py:390-432) — a
device→host→device sync in every forward pass and its single worst
bottleneck.  The TPU-native redesign: build the monotonic alignment path
path[b, t, n] = 1{cum[n−1] ≤ t < cum[n]} and expand with one
[B,T,N] × [B,N,C] matmul on the MXU.  Exactly differentiable (the backward is
the transposed matmul), fully static shapes via bucket-padded T.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vispeech_tpu.ops.masking import generate_path

from vispeech_tpu.ops.precision import get_matmul_precision

Array = jax.Array


def length_regulate(
    x: Array, duration: Array, t_frames: int
) -> Tuple[Array, Array]:
    """Expand x [B, N, C] by per-phoneme durations [B, N] → ([B, T, C], [B]).

    Frames beyond an utterance's total duration are zero.  Negative durations
    contribute nothing (matching the reference's max(d, 0) semantics,
    models.py:423).  Returns (frames, frame_lengths).
    """
    duration = jnp.maximum(duration, 0).astype(jnp.int32)
    path = generate_path(duration, t_frames).astype(x.dtype)  # [B, T, N]
    frames = jnp.einsum(
        "btn,bnc->btc", path, x, precision=get_matmul_precision()
    )
    frame_lengths = jnp.sum(duration, axis=1)
    return frames, frame_lengths


def length_regulate_gather(
    x: Array, duration: Array, t_frames: int
) -> Tuple[Array, Array]:
    """Gather-based variant (O(T·log N) index compute instead of a [T,N]
    matmul) — useful when N is large.  Same contract as length_regulate."""
    duration = jnp.maximum(duration, 0).astype(jnp.int32)
    ends = jnp.cumsum(duration, axis=1)  # [B, N]
    t = jnp.arange(t_frames, dtype=jnp.int32)
    # phoneme index owning frame t: #(ends <= t)
    idx = jax.vmap(lambda e: jnp.searchsorted(e, t, side="right"))(ends)
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    frames = jnp.take_along_axis(x, idx[..., None], axis=1)
    frame_lengths = ends[:, -1]
    valid = (t[None, :] < frame_lengths[:, None])[..., None]
    return frames * valid.astype(x.dtype), frame_lengths
