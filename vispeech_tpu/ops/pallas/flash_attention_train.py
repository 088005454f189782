"""Trainable fused relative-position self-attention (Pallas TPU, custom VJP).

The FramePriorNet's dense windowed-relative attention is the measured top
stage of the training step (benchmarks/artifacts/train_stages_bf16.json:
lr+fpn+proj ≈ 48 ms fwd+bwd at B=12 × 1024 frames vs ≤ 29 ms for every
other stage).  The XLA path materializes the [B, H, T, T] probabilities,
the [B, H, T, 2T−1] relative logits AND the dropout mask in HBM — and
saves them for the backward pass; at T=1024 that is ~100 MB per tensor per
layer × 4 FPN layers of pure HBM traffic.  This kernel keeps every [T, T]
intermediate in VMEM in both directions (reference semantics:
attentions.py:148-179 — full attention, banded relative bias, −1e4 mask
fill, dropout on the probabilities):

* **forward** — the inference kernel (flash_attention.py) plus (a) the
  per-row logsumexp streamed out as the only AD residual beyond the inputs,
  and (b) in-kernel dropout on the probabilities via the TPU PRNG, seeded
  per (batch·head, q-block) from a scalar seed.
* **backward** — grid (B·H,): one program holds K, V, the q rows, dO and
  the dk/dv/d rel accumulators in VMEM and loops over q-blocks,
  rematerializing p = exp(scores − lse) (and the identical dropout mask
  from the same seed) instead of loading it.  Per-program partial grads
  for the shared relative tables are reduced over (B·H) outside.

Validated against ``jax.grad`` of the XLA path in tests/test_flash_attn_train.py
(interpret mode on CPU, dropout off; dropout mask equality fwd-vs-bwd is
tested separately via two kernel invocations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vispeech_tpu.ops.pallas.flash_attention import NEG_INF, _round_up

Array = jax.Array


def _dropout_keep(shape, rate: float):
    """Regenerate the keep mask for the CURRENT prng stream position."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967296.0)
    return (bits >= threshold).astype(jnp.float32)


def _stream_seed(seed, bh, nq, qi):
    """Per-program dropout stream id — ONE definition shared by the forward
    and backward kernels so the regenerated bwd keep-mask is bit-identical
    to the fwd one (`nq` must be the q-block grid extent in both)."""
    return seed + bh * nq + qi


def _fwd_kernel(
    seed_ref,     # [1, 1] int32 (SMEM)
    q_ref,        # [1, BQ, d]
    k_ref,        # [1, T, d]
    v_ref,        # [1, T, d]
    relk_ref,     # [1, W, d]
    relv_ref,     # [1, W, d]
    mask_ref,     # [1, 1, T]
    o_ref,        # [1, BQ, d]
    lse_ref,      # [1, BQ, 1]  (trailing singleton: keeps the block's last
                  #  dim == the array's, legal for any BQ multiple of 8)
    *,
    scale: float,
    window: int,
    block_q: int,
    rate: float,
    compute_dtype=jnp.float32,
):
    # compute_dtype=bfloat16 under the reduced-precision policy: matmul
    # OPERANDS run at the bf16 MXU rate; softmax, lse, and every
    # accumulation stay f32 (preferred_element_type) — the standard
    # mixed-precision flash-attention arrangement.
    cd = compute_dtype
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0] * scale                      # [BQ, d]
    k = k_ref[0]                              # [T, d]
    v = v_ref[0]                              # [T, d]
    t_total = k.shape[0]
    qc = q.astype(cd)

    scores = jax.lax.dot_general(
        qc, k.astype(cd), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )                                         # [BQ, T]

    relk = relk_ref[0]                        # [W, d]
    q_rel = jax.lax.dot_general(
        qc, relk.astype(cd), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
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
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s                                 # [BQ, T]
    lse_ref[0] = m + jnp.log(s)               # [BQ, 1]

    if rate > 0.0:
        pltpu.prng_seed(_stream_seed(seed_ref[0, 0], bh, pl.num_programs(1), qi))
        p = p * _dropout_keep(p.shape, rate) * (1.0 / (1.0 - rate))

    out = jax.lax.dot_general(
        p.astype(cd), v.astype(cd), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
    )                                         # [BQ, d]

    relv = relv_ref[0]                        # [W, d]
    for d_off in range(-window, window + 1):
        band = (diff == d_off).astype(jnp.float32)
        p_diag = jnp.sum(p * band, axis=-1)   # [BQ]
        out = out + p_diag[:, None] * relv[d_off + window][None, :]

    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref,     # [1, 1] int32 (SMEM)
    q_ref,        # [1, T, d]
    k_ref,        # [1, T, d]
    v_ref,        # [1, T, d]
    relk_ref,     # [1, W, d]
    relv_ref,     # [1, W, d]
    mask_ref,     # [1, 1, T]
    lse_ref,      # [1, T, 1]
    do_ref,       # [1, T, d]
    dq_ref,       # [1, T, d]
    dk_ref,       # [1, T, d]
    dv_ref,       # [1, T, d]
    drelk_ref,    # [1, W, d]
    drelv_ref,    # [1, W, d]
    *,
    scale: float,
    window: int,
    block_q: int,
    rate: float,
    compute_dtype=jnp.float32,
):
    cd = compute_dtype  # bf16 matmul operands, f32 accumulators (see fwd)
    bh = pl.program_id(0)
    W = 2 * window + 1
    k = k_ref[0]                              # [T, d]
    v = v_ref[0]                              # [T, d]
    relk = relk_ref[0]                        # [W, d]
    relv = relv_ref[0]                        # [W, d]
    key_mask = mask_ref[0, 0]                 # [T]
    t_total = k.shape[0]
    nq = t_total // block_q
    d_model = k.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_total), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_total), 0)

    def body(qi, carry):
        dk_acc, dv_acc, drelk_acc, drelv_acc = carry
        qs = q_ref[0, pl.ds(qi * block_q, block_q), :] * scale   # [BQ, d]
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]          # [BQ, d]
        lse = lse_ref[0, pl.ds(qi * block_q, block_q), 0]        # [BQ]

        qc = qs.astype(cd)
        scores = jax.lax.dot_general(
            qc, k.astype(cd), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [BQ, T]
        q_rel = jax.lax.dot_general(
            qc, relk.astype(cd), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [BQ, W]
        diff = col - (row + qi * block_q)
        for d_off in range(-window, window + 1):
            band = (diff == d_off).astype(jnp.float32)
            scores = scores + band * q_rel[:, d_off + window][:, None]
        scores = jnp.where(key_mask[None, :] > 0, scores, NEG_INF)
        p = jnp.exp(scores - lse[:, None])                       # [BQ, T]

        if rate > 0.0:
            pltpu.prng_seed(_stream_seed(seed_ref[0, 0], bh, nq, qi))
            keep = _dropout_keep(p.shape, rate) * (1.0 / (1.0 - rate))
            pd = p * keep                                        # dropped probs
        else:
            keep = None
            pd = p

        # dL/d(pd): the pd·V matmul plus the banded rel_v correction
        doc = do.astype(cd)
        dpd = jax.lax.dot_general(
            doc, v.astype(cd), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [BQ, T]
        do_relv = jax.lax.dot_general(
            doc, relv.astype(cd), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [BQ, W]
        # drel_v[δ] += Σ_t pd[t, t+δ] · dO[t] — all W diagonals in one matmul
        pd_diags = []
        for d_off in range(-window, window + 1):
            band = (diff == d_off).astype(jnp.float32)
            dpd = dpd + band * do_relv[:, d_off + window][:, None]
            pd_diags.append(jnp.sum(pd * band, axis=-1))         # [BQ]
        drelv_acc = drelv_acc + jax.lax.dot_general(
            jnp.stack(pd_diags, 0).astype(cd), doc, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [W, d]

        # dv += pdᵀ · dO
        dv_acc = dv_acc + jax.lax.dot_general(
            pd.astype(cd), doc, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )

        dp = dpd * keep if rate > 0.0 else dpd
        # softmax backward: ds = p ∘ (dp − Σ_s dp∘p)
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)           # [BQ, 1]
        ds = p * (dp - dsum)                                     # [BQ, T]

        # dq(scaled) = ds·K + banded rel_k term; un-scale at the end
        dsc = ds.astype(cd)
        dqs = jax.lax.dot_general(
            dsc, k.astype(cd), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [BQ, d]
        ds_diags = []
        for d_off in range(-window, window + 1):
            band = (diff == d_off).astype(jnp.float32)
            ds_diag = jnp.sum(ds * band, axis=-1)                # [BQ]
            dqs = dqs + ds_diag[:, None] * relk[d_off + window][None, :]
            ds_diags.append(ds_diag)
        # drel_k[δ] += Σ_t ds[t, t+δ] · q̂[t]
        drelk_acc = drelk_acc + jax.lax.dot_general(
            jnp.stack(ds_diags, 0).astype(cd), qc, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )                                                        # [W, d]

        dq_ref[0, pl.ds(qi * block_q, block_q), :] = dqs * scale

        # dk += dsᵀ · q̂
        dk_acc = dk_acc + jax.lax.dot_general(
            dsc, qc, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc, drelk_acc, drelv_acc

    zeros = (
        jnp.zeros((t_total, d_model), jnp.float32),
        jnp.zeros((t_total, d_model), jnp.float32),
        jnp.zeros((W, d_model), jnp.float32),
        jnp.zeros((W, d_model), jnp.float32),
    )
    dk_acc, dv_acc, drelk_acc, drelv_acc = jax.lax.fori_loop(
        0, nq, body, zeros
    )
    dk_ref[0] = dk_acc
    dv_ref[0] = dv_acc
    drelk_ref[0] = drelk_acc
    drelv_ref[0] = drelv_acc


def _prep(q, k, v, key_mask, block_q):
    B, H, T, d = q.shape
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
    maskf = key_mask.astype(jnp.float32)[:, None, :]
    return qf, kf, vf, maskf, Tp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def relative_self_attention_train(
    q: Array,          # [B, H, T, d]
    k: Array,
    v: Array,
    rel_k: Array,      # [n_rel, 2w+1, d]
    rel_v: Array,
    key_mask: Array,   # [B, T] 1/0 float
    seed: Array,       # [] float32 (dropout stream id; cast to int32)
    rate: float,
    window: int = 4,
    block_q: int = 128,
    interpret: bool = False,
    bf16_compute: bool = False,
) -> Array:
    """``bf16_compute``: matmul operands at the bf16 MXU rate inside both
    kernels; softmax/lse/accumulators stay f32 (standard mixed-precision
    flash attention).  Gradients match the f32 kernel to bf16 rounding
    (tests/test_flash_attn_train.py::test_bf16_compute_grads)."""
    out, _ = _fwd(q, k, v, rel_k, rel_v, key_mask, seed,
                  rate, window, block_q, interpret, bf16_compute)
    return out


def _fwd(q, k, v, rel_k, rel_v, key_mask, seed, rate, window, block_q,
         interpret, bf16_compute=False):
    import math

    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    n_rel = rel_k.shape[0]
    W = 2 * window + 1
    qf, kf, vf, maskf, Tp = _prep(q, k, v, key_mask, block_q)
    relk = rel_k.astype(jnp.float32)
    relv = rel_v.astype(jnp.float32)
    seed_i = jnp.asarray(seed, jnp.float32).astype(jnp.int32).reshape(1, 1)

    grid = (B * H, Tp // block_q)
    rel_map = (lambda bh, qi, H=H, n_rel=n_rel:
               ((bh % H) if n_rel > 1 else 0, 0, 0))

    cd = jnp.bfloat16 if bf16_compute else jnp.float32
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, window=window, block_q=block_q,
            rate=rate, compute_dtype=cd,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), rel_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), rel_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda bh, qi, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tp, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed_i, qf, kf, vf, relk, relv, maskf)

    o = out.reshape(B, H, Tp, d)[:, :, :T].astype(q.dtype)
    res = (q, k, v, rel_k, rel_v, key_mask, seed, lse)
    return o, res


def _bwd(rate, window, block_q, interpret, bf16_compute, res, g):
    import math

    q, k, v, rel_k, rel_v, key_mask, seed, lse = res
    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    n_rel = rel_k.shape[0]
    W = 2 * window + 1
    qf, kf, vf, maskf, Tp = _prep(q, k, v, key_mask, block_q)
    relk = rel_k.astype(jnp.float32)
    relv = rel_v.astype(jnp.float32)
    seed_i = jnp.asarray(seed, jnp.float32).astype(jnp.int32).reshape(1, 1)

    go = g
    if Tp != T:
        go = jnp.pad(g, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    gof = go.reshape(B * H, Tp, d).astype(jnp.float32)

    grid = (B * H,)
    rel_map1 = (lambda bh, H=H, n_rel=n_rel:
                ((bh % H) if n_rel > 1 else 0, 0, 0))

    cd = jnp.bfloat16 if bf16_compute else jnp.float32
    dq, dk, dv, drelk_p, drelv_p = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, window=window, block_q=block_q,
            rate=rate, compute_dtype=cd,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), rel_map1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), rel_map1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda bh, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tp, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, W, d), jnp.float32),
            jax.ShapeDtypeStruct((B * H, W, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed_i, qf, kf, vf, relk, relv, maskf, lse, gof)

    dq = dq.reshape(B, H, Tp, d)[:, :, :T].astype(q.dtype)
    dk = dk.reshape(B, H, Tp, d)[:, :, :T].astype(k.dtype)
    dv = dv.reshape(B, H, Tp, d)[:, :, :T].astype(v.dtype)
    # reduce shared-table partials over (B·H) — or per head if not shared
    drelk_p = drelk_p.reshape(B, H, W, d)
    drelv_p = drelv_p.reshape(B, H, W, d)
    if n_rel > 1:
        drelk = drelk_p.sum(0).astype(rel_k.dtype)
        drelv = drelv_p.sum(0).astype(rel_v.dtype)
    else:
        drelk = drelk_p.sum((0, 1))[None].astype(rel_k.dtype)
        drelv = drelv_p.sum((0, 1))[None].astype(rel_v.dtype)
    return (dq, dk, dv, drelk, drelv,
            jnp.zeros_like(key_mask), jnp.zeros_like(seed))


relative_self_attention_train.defvjp(_fwd, _bwd)
