"""Fused WaveNet stack (Pallas TPU) — the affine-coupling / posterior-encoder
hot loop (reference modules.py:111-184; BASELINE.json north star's
"affine-coupling, dilated-conv" kernels).

The XLA path materializes a [B, T, 2C] gated activation in HBM per layer ×
n_layers (16 for the posterior encoder).  This kernel keeps the residual
state and skip accumulator resident in VMEM across all layers and streams
only the per-layer weights:

    grid = (B, L)  — L innermost, sequential on TPU, weights double-buffered
    layer l:  acts  = Σ_tap shift(x, tap−k//2) @ W_in[l, tap]     (MXU)
              acts += bias+cond[l]                                 (VPU)
              z     = tanh(acts[:, :C]) · sigmoid(acts[:, C:])     (VPU, the
                      reference's @torch.jit.script fused gate, commons.py:100)
              rs    = z @ W_rs[l] + b_rs[l]                        (MXU)
              x     = (x + rs[:, :C]) · mask ;  skip += rs[:, C:]
    output = (skip + rs_last[:, :C]) · mask

HBM traffic per batch item drops from O(L·T·C) activations to one x read and
one output write.  Restricted to dilation_rate==1 (every WN in this model:
posterior encoder k5/dil1 and all flow couplings, models.py:177-241) and to
the deterministic path (WN dropout is 0 throughout the reference configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shift_rows(x: Array, s: int, t: int, c: int) -> Array:
    """out[i] = x[i+s], zero beyond the edges (SAME zero padding)."""
    if s == 0:
        return x
    if s > 0:
        return jnp.concatenate(
            [x[s:], jnp.zeros((s, c), x.dtype)], axis=0
        )
    return jnp.concatenate(
        [jnp.zeros((-s, c), x.dtype), x[: t + s]], axis=0
    )


def _wn_kernel(
    x_ref,      # [1, T, C]
    mask_ref,   # [1, T, 1]
    cond_ref,   # [1, 1, 1, 2C]  (b_in[l] + per-batch conditioning)
    w_in_ref,   # [1, k, C, 2C]
    w_rs_ref,   # [1, C, 2C]
    b_rs_ref,   # [1, 1, 2C]
    o_ref,      # [1, T, C]
    x_scratch,  # VMEM [T, C]
    skip_scratch,  # VMEM [T, C]
    *,
    kernel_size: int,
    channels: int,
):
    l = pl.program_id(1)
    n_layers = pl.num_programs(1)
    C = channels
    T = x_ref.shape[1]

    @pl.when(l == 0)
    def _init():
        x_scratch[:] = x_ref[0]
        skip_scratch[:] = jnp.zeros_like(skip_scratch)

    xc = x_scratch[:]
    acts = cond_ref[0, 0, 0][None, :] * jnp.ones((T, 1), jnp.float32)
    for tap in range(kernel_size):
        xs = _shift_rows(xc, tap - kernel_size // 2, T, C)
        acts = acts + jax.lax.dot_general(
            xs, w_in_ref[0, tap],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
    z = jnp.tanh(acts[:, :C]) * jax.nn.sigmoid(acts[:, C:])
    rs = jax.lax.dot_general(
        z, w_rs_ref[0], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
    ) + b_rs_ref[0, 0][None, :]
    m = mask_ref[0, :, 0][:, None]

    @pl.when(l < n_layers - 1)
    def _update():
        x_scratch[:] = (xc + rs[:, :C]) * m
        skip_scratch[:] = skip_scratch[:] + rs[:, C:]

    @pl.when(l == n_layers - 1)
    def _emit():
        o_ref[0] = (skip_scratch[:] + rs[:, :C]) * m


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("kernel_size", "interpret"))
def wn_stack(
    x: Array,        # [B, T, C]
    mask: Array,     # [B, T, 1]
    cond: Array,     # [B, L, 2C]  per-layer bias (+conditioning)
    w_in: Array,     # [L, k, C, 2C] normalized weights
    w_rs: Array,     # [L, C, 2C]   (last layer: skip weights in [:, :C], rest 0)
    b_rs: Array,     # [L, 1, 2C]
    kernel_size: int,
    interpret: bool = False,
) -> Array:
    """Run the full fused WN stack → [B, T, C] skip output."""
    B, T, C = x.shape
    L = w_in.shape[0]

    Tp = _round_up(T, 8)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Tp - T), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _wn_kernel, kernel_size=kernel_size, channels=C
        ),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, Tp, C), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * C), lambda b, l: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kernel_size, C, 2 * C), lambda b, l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 2 * C), lambda b, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * C), lambda b, l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tp, C), lambda b, l: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Tp, C), jnp.float32),
            pltpu.VMEM((Tp, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        mask.astype(jnp.float32),
        cond.astype(jnp.float32)[:, :, None, :],
        w_in.astype(jnp.float32),
        w_rs.astype(jnp.float32),
        b_rs.astype(jnp.float32),
    )
    return out[:, :T].astype(x.dtype)


def pack_wn_weights(kernels, biases, rs_kernels, rs_biases, channels: int):
    """Stack per-layer WNConv1d effective weights into the kernel layout.

    kernels: list of [k, C, 2C]; rs_kernels: [C, 2C] for layers < L−1 and
    [C, C] for the last (padded so its skip contribution lands in [:, :C]).
    Returns (w_in [L,k,C,2C], b_in [L,2C], w_rs [L,C,2C], b_rs [L,1,2C]).
    """
    L = len(kernels)
    C = channels
    w_in = jnp.stack(kernels)
    b_in = jnp.stack(biases)
    rs_k, rs_b = [], []
    for i in range(L):
        wk, bk = rs_kernels[i][0], rs_biases[i]  # 1×1 conv: [1, C, cout]
        if wk.shape[-1] == C:  # last layer: pad to 2C, skip part first
            wk = jnp.concatenate([wk, jnp.zeros_like(wk)], axis=-1)
            bk = jnp.concatenate([bk, jnp.zeros_like(bk)], axis=-1)
        rs_k.append(wk)
        rs_b.append(bk)
    return w_in, b_in, jnp.stack(rs_k), jnp.stack(rs_b)[:, None, :]
