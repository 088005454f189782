"""Fused HiFi-GAN MRF stage (Pallas TPU) — the vocoder's dominant cost.

One generator stage runs 3 ResBlocks × 3 units × 2 convs = 18 convolutions
at low channel counts (256→32) over long sample axes (reference
models.py:266-284, modules.py:187-229).  In XLA each conv round-trips the
[B, T, C] activation through HBM — ~36 tensor trips per stage; at 44.1 kHz
batch-8 that is tens of GB per forward, and the stage is bandwidth-bound at
a few percent of MXU peak.

This kernel keeps the whole stage resident in VMEM — and, crucially, runs
CHANNEL-MAJOR ([C, T] per batch item): on the MXU only the contraction (K)
and lane (N) dimensions tile to 128, while rows (M) tile to the sublane
granularity of 8.  Putting the long time axis on lanes and channels on rows
makes every conv a full-width matmul even at C=32:

    out[C_out, T] = W[C_out, k·C_in] @ im2col(x)[k·C_in, T]   (C < 128)
    out[C_out, T] = Σ_tap W_tap[C_out, C_in] @ shift(x)[C_in, T] (C ≥ 128)

versus the time-major form [T, C] @ [C, C] whose K and N are both C — 25%
MXU fill at C=32 and sub-lane shuffles everywhere.

Structure per (batch, tile) program — halo from whole neighbor-tile
BlockSpec views (left/center/right of the same array; halo = 128 lanes,
≥ the 60-sample receptive radius of the k=11 branch):

      branch b:  state = x
        unit u:  h = leaky(state); h = conv_k,d(h)+b1   (MXU)
                 h = leaky(h);     h = conv_k,1(h)+b2   (MXU)
                 state += h
      out = (Σ_b state_b) / 3

Tap shifts are circular lane rolls; the wrap garbage stays within the halo.
SAME-conv edge semantics: the XLA path re-zeroes out-of-range positions at
*every* conv (zero padding), so every conv output — and the assembled
input — is masked with the global lane-position validity mask; this also
zeroes the clamped neighbor-tile garbage at sequence edges.

HBM traffic per stage drops from ~36 activation trips to ~4 (3 overlapping
reads + 1 write) plus the two channel-major transposes in XLA.

Inference-only (no VJP); training keeps the XLA path for autodiff.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BranchWeights = Tuple[Array, Array, Array, Array]  # w1 [U,k,C,C], b1 [U,1,C], w2, b2

HALO = 128  # lane-tile-aligned; covers the deepest receptive radius (60)


def _leaky(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * slope)


def _roll_lanes(x: Array, s: int, interpret: bool) -> Array:
    """out[..., i] = x[..., (i+s) mod n] — circular lane shift.

    jnp.roll does not lower through Mosaic; pltpu.roll is the TPU-native
    lane rotate (interpret mode falls back to jnp.roll)."""
    n = x.shape[-1]
    r = (-s) % n
    if r == 0:
        return x
    if interpret:
        return jnp.roll(x, r, axis=len(x.shape) - 1)
    return pltpu.roll(x, r, axis=len(x.shape) - 1)


def _conv_cm(
    h: Array, w_ref_slice, bias, k: int, d: int, channels: int,
    dtype, interpret: bool,
) -> Array:
    """k-tap dilated conv, channel-major: h [C, Tw] f32 → f32 [C, Tw].

    w_ref_slice: [k, C_in, C_out] (weight-norm-folded); bias: [C, 1] f32.
    shift s = (tap − (k−1)/2)·d is a circular lane roll; wrap garbage stays
    in the halo.  Rolls run on the f32 view (the TPU rotate unit is
    32-bit-only); operands cast to the matmul dtype after the roll.
    """
    c = (k - 1) // 2
    if channels < 128:
        # im2col: contraction k·C ≥ 128 → full MXU tiles
        cols = jnp.concatenate(
            [
                _roll_lanes(h, (tap - c) * d, interpret).astype(dtype)
                for tap in range(k)
            ],
            axis=0,
        )  # [k*C, Tw]
        w2d = w_ref_slice.reshape(k * channels, channels)  # [(tap,cin), cout]
        y = jax.lax.dot_general(
            w2d, cols, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )  # [C_out, Tw]
    else:
        y = None
        for tap in range(k):
            part = jax.lax.dot_general(
                w_ref_slice[tap],
                _roll_lanes(h, (tap - c) * d, interpret).astype(dtype),
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
            )
            y = part if y is None else y + part
    return y + bias


def _mrf_kernel(
    left_ref,       # [1, C, tile] — tile t−1 (clamped)
    mid_ref,        # [1, C, tile] — tile t
    right_ref,      # [1, C, tile] — tile t+1 (clamped)
    *refs,
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    tile: int,
    channels: int,
    t_total: int,
    interpret: bool,
):
    n_br = len(kernel_sizes)
    w_refs = refs[: 4 * n_br]
    o_ref = refs[4 * n_br]

    t = pl.program_id(1)
    # validity of each window lane in the *global* sequence: SAME convs
    # re-zero out-of-range positions at every layer in the XLA path, so the
    # halo is re-zeroed after every conv (bias would otherwise propagate
    # values past the sequence edge into the receptive field); this also
    # zeroes the clamped neighbor-tile garbage at t=0 / t=last.
    gpos = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile + 2 * HALO), 1)
        + t * tile - HALO
    )
    valid = jnp.logical_and(gpos >= 0, gpos < t_total).astype(jnp.float32)

    dtype = mid_ref.dtype  # matmul operand dtype (bf16 on the serving path)
    x = jnp.concatenate(
        [left_ref[0][:, tile - HALO :], mid_ref[0], right_ref[0][:, :HALO]],
        axis=1,
    ).astype(jnp.float32) * valid  # [C, tile + 2*HALO] f32

    acc = None
    for br in range(n_br):
        w1, b1, w2, b2 = w_refs[4 * br : 4 * br + 4]
        k = kernel_sizes[br]
        state = x
        for u, d in enumerate(dilations[br]):
            h = _leaky(state)
            y = _conv_cm(h, w1[u], b1[u].astype(jnp.float32), k, d, channels,
                         dtype, interpret)
            h = _leaky(y * valid)
            y = _conv_cm(h, w2[u], b2[u].astype(jnp.float32), k, 1, channels,
                         dtype, interpret)
            state = state + y * valid
        acc = state if acc is None else acc + state
    out = (acc / n_br).astype(o_ref.dtype)
    o_ref[0] = out[:, HALO : HALO + tile]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def branch_halo(kernel_sizes: Sequence[int], dilations) -> int:
    """Total receptive radius of the deepest branch."""
    spans = [
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds)
        for k, ds in zip(kernel_sizes, dilations)
    ]
    return max(spans)


def _pick_tile(channels: int) -> int:
    # sized so (im2col cols + f32 temporaries + pipelined input blocks +
    # weights) stay under the 16 MB scoped-VMEM limit at every stage width
    if channels <= 64:
        return 2048
    if channels <= 128:
        return 1024
    return 512


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "tile", "interpret"),
)
def mrf_stack(
    x: Array,                              # [B, T, C]
    packed: Tuple[BranchWeights, ...],     # one (w1, b1, w2, b2) per branch
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    tile: int = 0,
    interpret: bool = False,
) -> Array:
    """Averaged multi-receptive-field ResBlock1 stack → [B, T, C]."""
    B, T, C = x.shape
    tile = tile or _pick_tile(C)
    tile = _round_up(tile, 128)
    assert branch_halo(kernel_sizes, dilations) <= HALO <= tile
    Tp = _round_up(T, tile)
    x_cm = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))).transpose(0, 2, 1)
    nt = Tp // tile

    flat = []
    for w1, b1, w2, b2 in packed:
        flat += [
            w1.astype(x.dtype),                       # [U, k, Cin, Cout]
            jnp.swapaxes(b1, 1, 2).astype(jnp.float32),  # [U, C, 1]
            w2.astype(x.dtype),
            jnp.swapaxes(b2, 1, 2).astype(jnp.float32),
        ]

    n_br = len(kernel_sizes)
    x_specs = [
        pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, jnp.maximum(t - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, C, tile),
            lambda b, t, nt=nt: (b, 0, jnp.minimum(t + 1, nt - 1)),
            memory_space=pltpu.VMEM,
        ),
    ]
    w_specs = []
    for br in range(n_br):
        k = kernel_sizes[br]
        u = len(dilations[br])
        w_specs += [
            pl.BlockSpec((u, k, C, C), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, C, 1), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, k, C, C), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, C, 1), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        functools.partial(
            _mrf_kernel,
            kernel_sizes=tuple(kernel_sizes),
            dilations=tuple(tuple(d) for d in dilations),
            tile=tile,
            channels=C,
            t_total=T,
            interpret=interpret,
        ),
        grid=(B, nt),
        in_specs=x_specs + w_specs,
        out_specs=pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Tp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_cm, x_cm, x_cm, *flat)
    return out.transpose(0, 2, 1)[:, :T]


# ------------------------------------------------- folded narrow-channel tail


def _conv_offsets(h, w_ref, bias, offsets, dtype, interpret):
    """Multi-tap conv with explicit integer tap offsets, channel-major:
    y[:, t] = Σ_i w[i]ᵀ h[:, t + offsets[i]] + bias.  h [C, Tw] f32."""
    y = None
    for i, off in enumerate(offsets):
        part = jax.lax.dot_general(
            w_ref[i],
            _roll_lanes(h, off, interpret).astype(dtype),
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32,
        )
        y = part if y is None else y + part
    return y + bias


def _mrf_folded_kernel(
    left_ref, mid_ref, right_ref,     # [1, C', tile] folded, ch-major
    *refs,
    offsets: Tuple[Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...], ...],
    tile: int,
    t_total: int,                     # folded frames
    interpret: bool,
):
    """Same ResBlock1-stack structure as _mrf_kernel, but each conv is a
    folded conv given by explicit tap offsets (polyphase decomposition of a
    dilated SAME conv — ops/folded_mrf.py)."""
    n_refs = sum(4 * len(units) for units in offsets)
    w_refs = refs[:n_refs]
    o_ref = refs[n_refs]

    t = pl.program_id(1)
    gpos = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile + 2 * HALO), 1)
        + t * tile - HALO
    )
    valid = jnp.logical_and(gpos >= 0, gpos < t_total).astype(jnp.float32)

    dtype = mid_ref.dtype
    x = jnp.concatenate(
        [left_ref[0][:, tile - HALO :], mid_ref[0], right_ref[0][:, :HALO]],
        axis=1,
    ).astype(jnp.float32) * valid

    acc = None
    r = 0
    for units in offsets:
        state = x
        for off1, off2 in units:
            w1, b1, w2, b2 = w_refs[r : r + 4]
            r += 4
            h = _leaky(state)
            y = _conv_offsets(h, w1, b1[...].astype(jnp.float32), off1,
                              dtype, interpret)
            h = _leaky(y * valid)
            y = _conv_offsets(h, w2, b2[...].astype(jnp.float32), off2,
                              dtype, interpret)
            state = state + y * valid
        acc = state if acc is None else acc + state
    out = (acc / len(offsets)).astype(o_ref.dtype)
    o_ref[0] = out[:, HALO : HALO + tile]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "fold", "tile", "interpret"),
)
def mrf_stack_folded(
    x: Array,                              # [B, T, C], T % fold == 0
    packed: Tuple[BranchWeights, ...],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    fold: int = 4,
    tile: int = 0,
    interpret: bool = False,
) -> Array:
    """Polyphase-folded MRF stage fused into one VMEM-resident kernel.

    Numerically identical to the XLA folded path (ops/folded_mrf.py, tested
    in interpret mode).  Measured on v5e at the flagship C=32 tail
    (B16 × 720896 samples, bf16): 78.0 ms (tile 2048) vs 72.9 ms XLA —
    the folded stage is compute-bound, not HBM-bound (XLA already fuses the
    leaky/residual chains between convs), so the halo recompute of this
    kernel loses.  The generator therefore keeps the XLA folded dispatch at
    C<64 (models/generator.py); this kernel stays as the measured
    alternative so the dispatch decision is reproducible.  Inference-only,
    like mrf_stack.
    """
    from vispeech_tpu.ops.folded_mrf import fold_conv_weights

    B, T, C = x.shape
    if T % fold:
        raise ValueError(f"T={T} not divisible by fold={fold}")
    Cf = fold * C
    Tf = T // fold
    tile = tile or _pick_tile(Cf)
    tile = _round_up(tile, 128)

    flat = []
    offsets = []
    for (w1, b1, w2, b2), k, dils in zip(packed, kernel_sizes, dilations):
        units = []
        for j, d in enumerate(dils):
            wf1, bf1, p1 = fold_conv_weights(w1[j], b1[j, 0], d, fold)
            wf2, bf2, p2 = fold_conv_weights(w2[j], b2[j, 0], 1, fold)
            off1 = tuple(range(-p1[0], p1[1] + 1))
            off2 = tuple(range(-p2[0], p2[1] + 1))
            units.append((off1, off2))
            flat += [
                wf1.astype(x.dtype), bf1.astype(jnp.float32)[:, None],
                wf2.astype(x.dtype), bf2.astype(jnp.float32)[:, None],
            ]
        offsets.append(tuple(units))
    offsets = tuple(offsets)
    assert branch_halo(
        kernel_sizes, dilations
    ) // fold + 1 <= HALO <= tile, "folded receptive radius exceeds halo"

    Tfp = _round_up(Tf, tile)
    x_cm = jnp.pad(
        x.reshape(B, Tf, Cf), ((0, 0), (0, Tfp - Tf), (0, 0))
    ).transpose(0, 2, 1)
    nt = Tfp // tile

    x_specs = [
        pl.BlockSpec((1, Cf, tile), lambda b, t: (b, 0, jnp.maximum(t - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cf, tile), lambda b, t: (b, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, Cf, tile),
            lambda b, t, nt=nt: (b, 0, jnp.minimum(t + 1, nt - 1)),
            memory_space=pltpu.VMEM,
        ),
    ]
    w_specs = [
        pl.BlockSpec(a.shape, lambda b, t, n=a.ndim: (0,) * n,
                     memory_space=pltpu.VMEM)
        for a in flat
    ]

    out = pl.pallas_call(
        functools.partial(
            _mrf_folded_kernel,
            offsets=offsets,
            tile=tile,
            t_total=Tf,
            interpret=interpret,
        ),
        grid=(B, nt),
        in_specs=x_specs + w_specs,
        out_specs=pl.BlockSpec((1, Cf, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cf, Tfp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # 36 weight blocks + the f32 window/temporaries exceed the 16 MB
            # default scoped budget at tile 1024-2048
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_cm, x_cm, x_cm, *flat)
    return out.transpose(0, 2, 1)[:, :Tf].reshape(B, Tf * fold, C)
