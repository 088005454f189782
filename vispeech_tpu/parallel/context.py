"""Context (sequence) parallelism: ring attention over the frame axis and a
time-sharded vocoder with halo exchange (SURVEY.md §5 long-context; north
star configs 4-5 — new capability with no reference counterpart).

Both primitives run under ``shard_map`` over a named mesh axis; collectives
are explicit ``ppermute`` steps that ride ICI neighbor links.

- ``ring_relative_self_attention``: the FramePriorNet attention with the
  window-w relative bias, frame axis sharded P ways.  K/V/mask chunks rotate
  around the ring; each step updates an online softmax (running max, sum,
  value accumulator) plus a band accumulator for the relative-value
  correction, so the full [T, T] score matrix never exists anywhere.
- ``generator_context_parallel``: overlap-save vocoder — each shard gathers
  an H-frame halo from its ring neighbors, runs the full HiFi-GAN stack
  locally, and crops the halo at output rate.  H ≥ the generator's latent
  receptive field (≈25 frames for the 8·8·4·2 config) makes interior samples
  exact.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

NEG_INF = -1e4  # reference masked_fill (attentions.py:161)


def _band_bias(q_scaled: Array, rel_k: Array, row0: Array, col0: Array,
               window: int):
    """Banded relative-key bias for a (q-chunk, k-chunk) pair with global
    offsets row0/col0 → bias [B, H, Tq, Tk], diff [Tq, Tk]."""
    Tq = q_scaled.shape[-2]
    Tk = Tq  # equal chunking around the ring
    q_rel = jnp.einsum("bhtd,md->bhtm", q_scaled, rel_k)  # [B, H, Tq, 2w+1]
    row = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1) + col0
    diff = col - row
    bias = jnp.zeros(q_scaled.shape[:-1] + (Tk,), q_scaled.dtype)
    for d_off in range(-window, window + 1):
        sel = (diff == d_off).astype(q_scaled.dtype)[None, None]
        bias = bias + sel * q_rel[..., d_off + window][..., None]
    return bias, diff


def ring_relative_self_attention(
    q: Array,            # [B, H, T_local, d] (frame axis sharded)
    k: Array,
    v: Array,
    rel_k: Array,        # [2w+1, d] (heads-shared table)
    rel_v: Array,
    key_mask: Array,     # [B, T_local]
    axis_name: str,
    p_size: int,
    window: int = 4,
    vary_axes: Optional[tuple] = None,
) -> Array:
    """Inside shard_map: exact masked softmax attention with relative bias,
    sequence sharded over `axis_name`.  Returns the local output chunk."""
    B, H, Tl, d = q.shape
    P_size = p_size
    my_idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / math.sqrt(d)
    qs = q * scale
    W = 2 * window + 1

    row0 = my_idx * Tl

    def step(s, carry):
        k_blk, v_blk, m_blk, m_run, l_run, acc, acc_band = carry
        src = (my_idx - s) % P_size
        col0 = src * Tl

        bias, diff = _band_bias(qs, rel_k.astype(qs.dtype), row0, col0, window)
        scores = jnp.einsum("bhtd,bhsd->bhts", qs, k_blk) + bias
        scores = jnp.where(m_blk[:, None, None, :] > 0, scores, NEG_INF)

        m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1))
        rescale = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_new = l_run * rescale + jnp.sum(p, axis=-1)
        acc = acc * rescale[..., None] + jnp.einsum("bhts,bhsd->bhtd", p, v_blk)
        # band accumulation for the relative-value correction
        band = jnp.stack(
            [jnp.sum(p * (diff == d_off)[None, None], axis=-1)
             for d_off in range(-window, window + 1)], axis=-1
        )  # [B, H, Tl, W]
        acc_band = acc_band * rescale[..., None] + band

        # rotate k/v/mask to the next device
        perm = [(i, (i + 1) % P_size) for i in range(P_size)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        m_blk = jax.lax.ppermute(m_blk, axis_name, perm)
        return (k_blk, v_blk, m_blk, m_new, l_new, acc, acc_band)

    def vary(x):
        # tag fresh accumulators as varying over the ring axis AND any other
        # manual axis the inputs vary over (e.g. a 'data' batch axis on a
        # composed mesh) — the loop carry's vma types must match its outputs
        return jax.lax.pcast(x, vary_axes or (axis_name,), to="varying")

    init = (
        k, v, key_mask,
        vary(jnp.full((B, H, Tl), -jnp.inf, qs.dtype)),
        vary(jnp.zeros((B, H, Tl), qs.dtype)),
        vary(jnp.zeros((B, H, Tl, d), qs.dtype)),
        vary(jnp.zeros((B, H, Tl, W), qs.dtype)),
    )
    _, _, _, m_run, l_run, acc, acc_band = jax.lax.fori_loop(
        0, P_size, step, init
    )
    l_safe = jnp.maximum(l_run, 1e-30)
    out = acc / l_safe[..., None]
    band_p = acc_band / l_safe[..., None]
    out = out + jnp.einsum("bhtm,md->bhtd", band_p, rel_v.astype(out.dtype))
    return out


def make_ring_attention(
    mesh: Mesh,
    axis_name: str = "context",
    window: int = 4,
    batch_axis: Optional[str] = None,
):
    """shard_map-wrapped ring attention: full arrays in, full arrays out,
    frame axis sharded over `axis_name`.

    ``batch_axis``: optionally also shard the batch dim over another mesh
    axis (data-parallel serving composed with context parallelism on ONE
    mesh — north-star config-5; the ring's ppermute then runs per
    data-slice concurrently)."""
    b = batch_axis

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(b, None, axis_name, None),
            P(b, None, axis_name, None),
            P(b, None, axis_name, None),
            P(),
            P(),
            P(b, axis_name),
        ),
        out_specs=P(b, None, axis_name, None),
    )
    def fn(q, k, v, rel_k, rel_v, key_mask):
        return ring_relative_self_attention(
            q, k, v, rel_k, rel_v, key_mask, axis_name,
            p_size=mesh.shape[axis_name], window=window,
            vary_axes=(axis_name,) + ((b,) if b else ()),
        )

    return fn


# --------------------------------------------------------------- vocoder CP

GENERATOR_HALO_FRAMES = 32  # ≥ latent receptive field of the 8·8·4·2 stack


def make_generator_context_parallel(
    generator_apply,   # (z_local, g) -> audio_local; full generator fn
    mesh: Mesh,
    hop_length: int,
    axis_name: str = "context",
    halo: int = GENERATOR_HALO_FRAMES,
    batch_axis: Optional[str] = None,
):
    """Overlap-save time-sharded vocoder.

    ``generator_apply`` runs the full HiFi-GAN stack on a local latent chunk
    extended by `halo` frames on both sides (gathered from ring neighbors via
    ppermute); the halo region is cropped at output rate.  All interior
    samples are exact for halo ≥ the receptive field; only the outermost
    ~RF samples of the WHOLE utterance (first/last few, <0.2 ms at 44.1 kHz)
    differ from the unsharded computation, because an explicit zero halo is
    not identical to per-layer conv zero-padding once biases propagate.
    """
    p_size = mesh.shape[axis_name]

    def local_fn(z_local, g):
        # z_local: [B, T_local, C]
        left = z_local[:, -halo:]
        right = z_local[:, :halo]
        idx = jax.lax.axis_index(axis_name)
        perm_fwd = [(i, (i + 1) % p_size) for i in range(p_size)]
        perm_bwd = [(i, (i - 1) % p_size) for i in range(p_size)]
        left_halo = jax.lax.ppermute(left, axis_name, perm_fwd)    # from idx−1
        right_halo = jax.lax.ppermute(right, axis_name, perm_bwd)  # from idx+1
        # zero the wrapped-around halos at the sequence boundaries
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            idx == p_size - 1, jnp.zeros_like(right_halo), right_halo
        )
        z_ext = jnp.concatenate([left_halo, z_local, right_halo], axis=1)
        audio = generator_apply(z_ext, g)  # [B, T_ext*hop, 1]
        return audio[:, halo * hop_length : -halo * hop_length]

    b = batch_axis
    return functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(b, axis_name, None), P(b, None, None)),
        out_specs=P(b, axis_name, None),
    )(local_fn)
