"""Trainable fused WaveNet stack (Pallas TPU, custom VJP).

The inference kernel (ops/pallas/wn_stack.py) keeps the residual state in
VMEM across all L layers and has no JVP, so training fell back to the XLA
layer-by-layer path — which materializes the [B, T, 2C] gated activation in
HBM per layer (reference modules.py:111-184 behavior).  This module makes the
fused stack differentiable:

* **forward** — same single kernel, additionally streaming the per-layer
  residual inputs ``xs[b, l] = x_l`` to HBM (the minimal AD residual: one
  [T, C] tensor per layer, vs XLA's several per layer).
* **backward** — one kernel, grid (B, L) with L reversed, carrying
  dL/dx_{l+1} in VMEM.  The gate activations are *rematerialized* from
  ``xs`` with the same MXU matmuls as forward (cheaper than storing the
  [T, 2C] acts), then per-layer grads are emitted:

      d_rs  = [dx_{l+1}·m  |  g_out]        (g_out = dout·m, the skip grad)
      dz    = d_rs @ W_rs[l]ᵀ
      dacts = [dz·σ·(1−tanh²) | dz·tanh·σ·(1−σ)]
      dW_in[l,tap] += shift(x_l, s)ᵀ @ dacts        (per-batch partials)
      dx_l  = dx_{l+1}·m + Σ_tap shift(dacts @ W_in[l,tap]ᵀ, −s)

  Weight/cond grads are written as per-batch partial sums [B, L, …] and
  reduced over B outside the kernel (grid batch steps run in parallel, so
  in-kernel cross-batch accumulation would race).

Validated against ``jax.grad`` of the XLA WN path (tests/test_wn_train.py,
interpret mode on CPU).  Same restrictions as the inference kernel:
dilation_rate == 1 and no dropout — every WN in this model (reference
models.py:177-241 posterior/flows, p_dropout=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vispeech_tpu.ops.pallas.wn_stack import _round_up, _shift_rows

Array = jax.Array


def _fwd_kernel(
    x_ref,      # [1, T, C]
    mask_ref,   # [1, T, 1]
    cond_ref,   # [1, 1, 1, 2C]
    w_in_ref,   # [1, k, C, 2C]
    w_rs_ref,   # [1, C, 2C]
    b_rs_ref,   # [1, 1, 2C]
    o_ref,      # [1, T, C]
    xs_ref,     # [1, 1, T, C]   per-layer residual input (AD residual)
    x_scratch,
    skip_scratch,
    *,
    kernel_size: int,
    channels: int,
    compute_dtype=jnp.float32,
):
    # compute_dtype=bfloat16 under the reduced-precision policy: matmul
    # OPERANDS are cast to bf16 (2x MXU rate on TPU) while every
    # accumulator — acts, the residual carry, the skip sum, the gate — stays
    # f32 (preferred_element_type).  This is what makes bf16 training
    # actually faster than f32 (VERDICT r5: the old all-f32 kernel under
    # bf16 params measured 9.7 steps/s vs 10.0 f32 — no harvest).
    cd = compute_dtype
    l = pl.program_id(1)
    n_layers = pl.num_programs(1)
    C = channels
    T = x_ref.shape[1]

    @pl.when(l == 0)
    def _init():
        x_scratch[:] = x_ref[0]
        skip_scratch[:] = jnp.zeros_like(skip_scratch)

    xc = x_scratch[:]
    xs_ref[0, 0] = xc  # save layer input for the backward pass
    acts = cond_ref[0, 0, 0][None, :] * jnp.ones((T, 1), jnp.float32)
    for tap in range(kernel_size):
        xs = _shift_rows(xc, tap - kernel_size // 2, T, C)
        acts = acts + jax.lax.dot_general(
            xs.astype(cd), w_in_ref[0, tap].astype(cd),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
    z = jnp.tanh(acts[:, :C]) * jax.nn.sigmoid(acts[:, C:])
    rs = jax.lax.dot_general(
        z.astype(cd), w_rs_ref[0].astype(cd), (((1,), (0,)), ((), ())),
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


def _bwd_kernel(
    dout_ref,    # [1, T, C]
    xs_ref,      # [1, 1, T, C]    layer input x_l (l reversed via index map)
    mask_ref,    # [1, T, 1]
    cond_ref,    # [1, 1, 1, 2C]
    w_in_ref,    # [1, k, C, 2C]
    w_rs_ref,    # [1, C, 2C]
    dx_ref,      # [1, T, C]        out: dL/dx
    dcond_ref,   # [1, 1, 1, 2C]    out: per-(b,l) cond grad
    dwin_ref,    # [1, 1, k, C, 2C] out: per-batch W_in grad partial
    dwrs_ref,    # [1, 1, C, 2C]    out: per-batch W_rs grad partial
    dbrs_ref,    # [1, 1, 1, 2C]    out: per-batch b_rs grad partial
    dx_scratch,  # VMEM [T, C]     carry: dL/dx_{l+1}
    *,
    kernel_size: int,
    channels: int,
    compute_dtype=jnp.float32,
):
    cd = compute_dtype  # bf16 matmul operands, f32 accumulators (see fwd)
    i = pl.program_id(1)          # 0 .. L-1, layer l = L-1-i (index maps)
    C = channels
    T = dout_ref.shape[1]
    m = mask_ref[0, :, 0][:, None]
    g_out = dout_ref[0] * m       # grad of the masked output / skip sum
    x_l = xs_ref[0, 0]

    # ---- rematerialize the gate (same MXU work as forward)
    acts = cond_ref[0, 0, 0][None, :] * jnp.ones((T, 1), jnp.float32)
    for tap in range(kernel_size):
        xsh = _shift_rows(x_l, tap - kernel_size // 2, T, C)
        acts = acts + jax.lax.dot_general(
            xsh.astype(cd), w_in_ref[0, tap].astype(cd),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
    t_ = jnp.tanh(acts[:, :C])
    s_ = jax.nn.sigmoid(acts[:, C:])
    z = t_ * s_

    # ---- grad into rs = z @ W_rs + b_rs
    # last layer (i==0): out = (skip + rs[:, :C])·m  → d_rs = [g_out | 0]
    # else: x_{l+1} = (x_l + rs[:, :C])·m, skip += rs[:, C:]
    #       → d_rs = [dx_{l+1}·m | g_out]
    dres = jnp.where(i == 0, g_out, dx_scratch[:] * m)
    dskip = jnp.where(i == 0, jnp.zeros_like(g_out), g_out)
    d_rs = jnp.concatenate([dres, dskip], axis=1)  # [T, 2C]

    dwrs_ref[0, 0] = jax.lax.dot_general(
        z.astype(cd), d_rs.astype(cd), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
    )
    dbrs_ref[0, 0, 0] = jnp.sum(d_rs, axis=0)

    dz = jax.lax.dot_general(
        d_rs.astype(cd), w_rs_ref[0].astype(cd), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
    )
    da1 = dz * s_ * (1.0 - t_ * t_)
    da2 = dz * t_ * s_ * (1.0 - s_)
    dacts = jnp.concatenate([da1, da2], axis=1)  # [T, 2C]
    dcond_ref[0, 0, 0] = jnp.sum(dacts, axis=0)

    # ---- conv grads: weight partial + input grad (transposed shifts)
    dx_conv = jnp.zeros((T, C), jnp.float32)
    dacts_c = dacts.astype(cd)
    for tap in range(kernel_size):
        s = tap - kernel_size // 2
        xsh = _shift_rows(x_l, s, T, C)
        dwin_ref[0, 0, tap] = jax.lax.dot_general(
            xsh.astype(cd), dacts_c, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
        contrib = jax.lax.dot_general(
            dacts_c, w_in_ref[0, tap].astype(cd), (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
        dx_conv = dx_conv + _shift_rows(contrib, -s, T, C)

    # residual identity path: dx_l += dx_{l+1}·m (not at the last layer)
    dx_l = dx_conv + jnp.where(i == 0, jnp.zeros_like(dres), dres)
    dx_scratch[:] = dx_l

    @pl.when(i == pl.num_programs(1) - 1)  # layer 0: emit dL/dx
    def _emit():
        dx_ref[0] = dx_l


def _pad_time(x: Array, mask: Array, Tp: int):
    T = x.shape[1]
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Tp - T), (0, 0)))
    return x, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def wn_stack_train(
    x: Array,        # [B, T, C]
    mask: Array,     # [B, T, 1]
    cond: Array,     # [B, L, 2C]
    w_in: Array,     # [L, k, C, 2C]
    w_rs: Array,     # [L, C, 2C]
    b_rs: Array,     # [L, 1, 2C]
    kernel_size: int,
    interpret: bool = False,
    bf16_compute: bool = False,
) -> Array:
    """``bf16_compute``: cast matmul OPERANDS to bf16 inside the kernel
    (2x MXU rate) while all accumulators/carries stay f32 — the shipped
    reduced-precision policy's fast path.  Gradients match the f32 kernel
    to bf16 rounding (tests/test_wn_train.py::test_bf16_compute_grads)."""
    out, _ = _fwd(x, mask, cond, w_in, w_rs, b_rs, kernel_size, interpret,
                  bf16_compute)
    return out


def _fwd(x, mask, cond, w_in, w_rs, b_rs, kernel_size, interpret,
         bf16_compute=False):
    B, T, C = x.shape
    L = w_in.shape[0]
    Tp = _round_up(T, 8)
    xp, maskp = _pad_time(x, mask, Tp)
    cd = jnp.bfloat16 if bf16_compute else jnp.float32

    out, xs = pl.pallas_call(
        functools.partial(_fwd_kernel, kernel_size=kernel_size, channels=C,
                          compute_dtype=cd),
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
        out_specs=[
            pl.BlockSpec((1, Tp, C), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp, C), lambda b, l: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, Tp, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tp, C), jnp.float32),
            pltpu.VMEM((Tp, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # flagship training shapes (B12 x T1024 x C192, 2C=384 gate) put
            # blocks + double buffering + stack temporaries over the default
            # 16 MB scoped-VMEM budget; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp.astype(jnp.float32),
        maskp.astype(jnp.float32),
        cond.astype(jnp.float32)[:, :, None, :],
        w_in.astype(jnp.float32),
        w_rs.astype(jnp.float32),
        b_rs.astype(jnp.float32),
    )
    # residuals must be a pytree of arrays: the unpadded mask carries the
    # static T; the 0-size token carries x's dtype for the dx cotangent
    residuals = (xs, mask, cond, w_in, w_rs, jnp.zeros((0,), x.dtype))
    return out[:, :T].astype(x.dtype), residuals


def _bwd(kernel_size, interpret, bf16_compute, residuals, dout):
    xs, mask, cond, w_in, w_rs, dtype_token = residuals
    B, L, Tp, C = xs.shape
    T = mask.shape[1]
    maskp = mask.astype(jnp.float32)
    if Tp != T:
        maskp = jnp.pad(maskp, ((0, 0), (0, Tp - T), (0, 0)))
    dout = dout.astype(jnp.float32)
    if Tp != T:
        dout = jnp.pad(dout, ((0, 0), (0, Tp - T), (0, 0)))
    cd = jnp.bfloat16 if bf16_compute else jnp.float32

    dx, dcond, dwin_p, dwrs_p, dbrs_p = pl.pallas_call(
        functools.partial(_bwd_kernel, kernel_size=kernel_size, channels=C,
                          compute_dtype=cd),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, Tp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # layer reversal happens here: step i reads layer L-1-i
            pl.BlockSpec((1, 1, Tp, C), lambda b, i: (b, L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * C), lambda b, i: (b, L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kernel_size, C, 2 * C),
                         lambda b, i: (L - 1 - i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 2 * C), lambda b, i: (L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-(b,l) vectors carry a unit axis so the trailing two block
            # dims equal the array dims (TPU (8,128) tiling rule)
            pl.BlockSpec((1, 1, 1, 2 * C), lambda b, i: (b, L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kernel_size, C, 2 * C),
                         lambda b, i: (b, L - 1 - i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, 2 * C), lambda b, i: (b, L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2 * C), lambda b, i: (b, L - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 1, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, kernel_size, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 1, 2 * C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Tp, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # flagship training shapes (B12 x T1024 x C192, 2C=384 gate) put
            # blocks + double buffering + stack temporaries over the default
            # 16 MB scoped-VMEM budget; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        dout.astype(jnp.float32), xs, maskp,
        cond.astype(jnp.float32)[:, :, None, :],
        w_in.astype(jnp.float32), w_rs.astype(jnp.float32),
    )
    # reduce the per-batch weight-grad partials (parallel batch grid steps
    # cannot accumulate into one block without racing)
    dw_in = jnp.sum(dwin_p, axis=0).astype(w_in.dtype)
    dw_rs = jnp.sum(dwrs_p, axis=0).astype(w_rs.dtype)
    db_rs = jnp.sum(dbrs_p, axis=0).astype(w_rs.dtype)  # [L, 1, 2C]
    return (
        dx[:, :T].astype(dtype_token.dtype),
        jnp.zeros_like(mask),  # mask is non-differentiable data
        dcond[:, :, 0].astype(cond.dtype),
        dw_in, dw_rs, db_rs,
    )


wn_stack_train.defvjp(_fwd, _bwd)
