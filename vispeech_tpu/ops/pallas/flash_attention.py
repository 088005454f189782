"""Fused self-attention with windowed relative-position bias (Pallas TPU).

The FramePriorNet attends over up to 1400 frames — the O(T²) hot spot of the
model (reference attentions.py:148-179; SURVEY.md §5 long-context).  This
kernel computes one Q block against the full key sequence entirely in VMEM:

    scores = (q·scale) Kᵀ + rel_band(q, rel_k)        (MXU)
    scores = where(key_mask, scores, −1e4)            (VPU)
    p      = softmax(scores)                          (VPU, exact)
    out    = p V + rel_v_correction(p, rel_v)         (MXU + VPU)

so the [T, T] score matrix never round-trips through HBM — for T=1408 that
removes ~16 MB of HBM traffic per (batch, head, layer) pass.  The relative
bias has window w (=4): scores[t, s] += q[t]·rel_k[s−t+w] for |s−t| ≤ w, and
out[t] += Σ_δ p[t, t+δ]·rel_v[δ+w] — both applied as 2w+1 banded updates on
the VPU, matching ops/attention.py's pad-reshape-skew formulation exactly
(same −1e4 mask fill, same f32 accumulation).

Supports batch-varying key masks; sequence length pads to the Q-block size.
Used for deterministic (inference) attention; training keeps the XLA path
(dropout on attention probabilities needs the torch-parity RNG pattern).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e4  # the reference's masked_fill value (attentions.py:161)


def _attention_kernel(
    q_ref,        # [1, BQ, d]
    k_ref,        # [1, T, d]
    v_ref,        # [1, T, d]
    relk_ref,     # [1, W, d]   W = 2w+1
    relv_ref,     # [1, W, d]
    mask_ref,     # [1, 1, T]   key validity (1/0)
    o_ref,        # [1, BQ, d]
    *,
    scale: float,
    window: int,
    block_q: int,
):
    qi = pl.program_id(1)
    q = q_ref[0] * scale                      # [BQ, d]
    k = k_ref[0]                              # [T, d]
    v = v_ref[0]                              # [T, d]
    t_total = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )                                         # [BQ, T]

    # banded relative-key bias: qR = q·rel_kᵀ → [BQ, 2w+1]
    relk = relk_ref[0]                        # [W, d]
    q_rel = jax.lax.dot_general(
        q, relk, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )                                         # [BQ, W]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_total), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_total), 1)
    diff = col - (row + qi * block_q)         # s − t
    for d_off in range(-window, window + 1):
        band = (diff == d_off).astype(jnp.float32)
        scores = scores + band * q_rel[:, d_off + window][:, None]

    key_mask = mask_ref[0, 0]                 # [T]
    scores = jnp.where(key_mask[None, :] > 0, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [BQ, T]

    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )                                         # [BQ, d]

    # relative-value correction: out[t] += Σ_δ p[t, t+δ] · rel_v[δ+w]
    relv = relv_ref[0]                        # [W, d]
    for d_off in range(-window, window + 1):
        band = (diff == d_off).astype(jnp.float32)
        p_diag = jnp.sum(p * band, axis=-1)   # [BQ]
        out = out + p_diag[:, None] * relv[d_off + window][None, :]

    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("window", "block_q", "interpret")
)
def relative_self_attention(
    q: Array,            # [B, H, T, d]
    k: Array,
    v: Array,
    rel_k: Array,        # [n_rel, 2w+1, d] (n_rel ∈ {1, H})
    rel_v: Array,
    key_mask: Array,     # [B, T] 1/0
    window: int = 4,
    block_q: int = 128,
    interpret: bool = False,
) -> Array:
    """Fused masked self-attention with windowed relative bias → [B, H, T, d].

    Matches ops/attention.py's XLA formulation bit-for-bit up to float
    reassociation (tested in tests/test_pallas_kernels.py).
    """
    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    n_rel = rel_k.shape[0]
    W = 2 * window + 1

    Tp = _round_up(T, block_q)
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, Tp - T)))

    qf = q.reshape(B * H, Tp, d).astype(jnp.float32)
    kf = k.reshape(B * H, Tp, d).astype(jnp.float32)
    vf = v.reshape(B * H, Tp, d).astype(jnp.float32)
    relk = rel_k.astype(jnp.float32)
    relv = rel_v.astype(jnp.float32)
    maskf = key_mask.astype(jnp.float32)[:, None, :]  # [B, 1, Tp]

    grid = (B * H, Tp // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, scale=scale, window=window, block_q=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d),
                         lambda bh, qi, H=H, n_rel=n_rel: (
                             (bh % H) if n_rel > 1 else 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d),
                         lambda bh, qi, H=H, n_rel=n_rel: (
                             (bh % H) if n_rel > 1 else 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda bh, qi, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, d), jnp.float32),
        interpret=interpret,
    )(qf, kf, vf, relk, relv, maskf)

    out = out.reshape(B, H, Tp, d)[:, :, :T]
    return out.astype(q.dtype)
