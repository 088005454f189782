"""Fused HiFi-GAN MRF stage (Pallas TPU) — the vocoder's dominant cost.

One generator stage runs 3 ResBlocks × 3 units × 2 convs = 18 convolutions
at low channel counts (256→32) over long sample axes (reference
models.py:266-284, modules.py:187-229).  In XLA each conv round-trips the
[B, T, C] activation through HBM — ~36 tensor trips per stage; at 44.1 kHz
batch-8 that is tens of GB per forward, and the stage is bandwidth-bound at
a few percent of MXU peak.

This kernel keeps the whole stage resident in VMEM:

    grid = (B, T/tile); each program sees its tile plus the two neighbor
    tiles (three BlockSpec views of the same array with clamped index maps —
    HBM sub-128-lane DMA slices are not expressible, so halos come from
    whole neighbor tiles), assembles a [tile+2·halo, C] window, then runs
    all 3 branches (k=3,7,11; dilations 1,3,5) with taps as shifted matmuls
    (im2col single-dot when C < 128 so the contraction dim reaches k·C;
    per-tap dots when C ≥ 128):

      branch b:  state = x
        unit u:  h = leaky(state); h = conv_k,d(h)+b1   (MXU)
                 h = leaky(h);     h = conv_k,1(h)+b2   (MXU)
                 state += h
      out = (Σ_b state_b) / 3

HBM traffic per stage drops from ~36 activation trips to ~4 (3 overlapping
reads + 1 write).  Halo = the receptive radius of the deepest branch
(k=11: Σ(5d+5) = 60 ≤ 64) so the tile center is exact.  SAME-conv edge
semantics: the XLA path re-zeroes out-of-range positions at *every* conv
(zero padding), so the kernel masks every conv output — and the assembled
input — with the global position validity mask; clamped neighbor-tile
garbage at sequence edges is zeroed by the same mask.

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


def _shift_rows(x: Array, s: int) -> Array:
    """out[i] = x[i+s]; zero-fill beyond the buffer (garbage stays in halo)."""
    if s == 0:
        return x
    t, c = x.shape
    if s > 0:
        return jnp.concatenate([x[s:], jnp.zeros((s, c), x.dtype)], axis=0)
    return jnp.concatenate([jnp.zeros((-s, c), x.dtype), x[: t + s]], axis=0)


def _leaky(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * slope)


def _conv(h: Array, w_ref_slice, bias, k: int, d: int, channels: int) -> Array:
    """k-tap dilated conv over the tile: shifted matmuls on the MXU.

    h: [T', C] (compute dtype); w_ref_slice: [k, C, C]; bias: [1, C] f32.
    Returns f32 [T', C].
    """
    c = (k - 1) // 2
    if channels < 128:
        # im2col: one dot with contraction k·C (≥ a full MXU tile for k·C ≥ 128)
        cols = jnp.concatenate(
            [_shift_rows(h, (tap - c) * d) for tap in range(k)], axis=1
        )  # [T', k*C]
        w_flat = w_ref_slice.reshape(k * channels, channels)
        y = jax.lax.dot_general(
            cols, w_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        y = None
        for tap in range(k):
            part = jax.lax.dot_general(
                _shift_rows(h, (tap - c) * d), w_ref_slice[tap],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = part if y is None else y + part
    return y + bias


def _mrf_kernel(
    left_ref,       # [1, tile, C] — tile t−1 (clamped)
    mid_ref,        # [1, tile, C] — tile t
    right_ref,      # [1, tile, C] — tile t+1 (clamped)
    *refs,
    kernel_sizes: Tuple[int, ...],
    dilations: Tuple[Tuple[int, ...], ...],
    tile: int,
    halo: int,
    channels: int,
    t_total: int,
):
    n_br = len(kernel_sizes)
    w_refs = refs[: 4 * n_br]
    o_ref = refs[4 * n_br]

    t = pl.program_id(1)
    # validity of each window position in the *global* sequence: SAME convs
    # re-zero out-of-range positions at every layer in the XLA path, so the
    # halo is re-zeroed after every conv (bias would otherwise propagate
    # values past the sequence edge into the receptive field); this also
    # zeroes the clamped neighbor-tile garbage at t=0 / t=last.
    gpos = (
        jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * halo, 1), 0)
        + t * tile - halo
    )
    valid = jnp.logical_and(gpos >= 0, gpos < t_total).astype(jnp.float32)

    x = jnp.concatenate(
        [left_ref[0, tile - halo :], mid_ref[0], right_ref[0, :halo]], axis=0
    )  # [tile + 2*halo, C]
    dtype = x.dtype
    x = (x.astype(jnp.float32) * valid).astype(dtype)

    acc = None
    for br in range(n_br):
        w1, b1, w2, b2 = w_refs[4 * br : 4 * br + 4]
        k = kernel_sizes[br]
        state = x
        for u, d in enumerate(dilations[br]):
            h = _leaky(state.astype(jnp.float32)).astype(dtype)
            y = _conv(h, w1[u], b1[u].astype(jnp.float32), k, d, channels)
            h = _leaky(y * valid).astype(dtype)
            y = _conv(h, w2[u], b2[u].astype(jnp.float32), k, 1, channels)
            state = state + (y * valid).astype(dtype)
        acc = state if acc is None else acc + state
    out = (acc.astype(jnp.float32) / n_br).astype(o_ref.dtype)
    o_ref[0] = out[halo : halo + tile]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def branch_halo(kernel_sizes: Sequence[int], dilations) -> int:
    """Total receptive radius of the deepest branch."""
    spans = [
        sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds)
        for k, ds in zip(kernel_sizes, dilations)
    ]
    return _round_up(max(spans), 8)


def _pick_tile(channels: int) -> int:
    # sized to keep (im2col cols + f32 temporaries + pipelined input blocks +
    # weights) under the 16 MB scoped-VMEM limit at every stage width
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
    """Averaged multi-receptive-field ResBlock1 stack → [B, T, C].

    Channels below a full 128 lane tile would run every matmul and lane
    shuffle at C/128 utilization, so P = 128//C batch items are packed into
    the lane axis first ([B, T, C] → [B/P, T, P·C]) and the conv weights are
    expanded block-diagonally (kron(I_P, W)); the MXU then runs full tiles.
    P× redundant block FLOPs, but ~4-10× faster wall-clock at C=32/64 than
    the lane-sliced form.
    """
    B, T, C = x.shape
    pack = max(1, 128 // C) if C < 128 else 1
    if pack > 1:
        Bp = _round_up(B, pack)
        if Bp != B:
            x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
        xg = x.reshape(Bp // pack, pack, T, C).transpose(0, 2, 1, 3)
        xg = xg.reshape(Bp // pack, T, pack * C)
        eye = jnp.eye(pack, dtype=x.dtype)
        expanded = []
        for w1, b1, w2, b2 in packed:
            # [U,k,C,C] → [U,k,P·C,P·C] block-diagonal; biases tile over lanes
            e1 = jnp.einsum("pq,ukcd->ukpcqd", eye, w1.astype(x.dtype))
            e1 = e1.reshape(w1.shape[0], w1.shape[1], pack * C, pack * C)
            e2 = jnp.einsum("pq,ukcd->ukpcqd", eye, w2.astype(x.dtype))
            e2 = e2.reshape(w2.shape[0], w2.shape[1], pack * C, pack * C)
            expanded.append((
                e1, jnp.tile(b1, (1, 1, pack)),
                e2, jnp.tile(b2, (1, 1, pack)),
            ))
        out = mrf_stack(
            xg, tuple(expanded), kernel_sizes, dilations,
            tile=tile, interpret=interpret,
        )
        out = out.reshape(Bp // pack, T, pack, C).transpose(0, 2, 1, 3)
        return out.reshape(Bp, T, C)[:B]
    tile = tile or _pick_tile(C)
    halo = branch_halo(kernel_sizes, dilations)
    assert halo <= tile, (halo, tile)
    Tp = _round_up(T, tile)
    x_p = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    nt = Tp // tile

    flat = []
    for w1, b1, w2, b2 in packed:
        flat += [
            w1.astype(x.dtype),
            b1.astype(jnp.float32),
            w2.astype(x.dtype),
            b2.astype(jnp.float32),
        ]

    n_br = len(kernel_sizes)
    x_specs = [
        pl.BlockSpec((1, tile, C), lambda b, t: (b, jnp.maximum(t - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, tile, C),
            lambda b, t, nt=nt: (b, jnp.minimum(t + 1, nt - 1), 0),
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
            pl.BlockSpec((u, 1, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, k, C, C), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 1, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        functools.partial(
            _mrf_kernel,
            kernel_sizes=tuple(kernel_sizes),
            dilations=tuple(tuple(d) for d in dilations),
            tile=tile,
            halo=halo,
            channels=C,
            t_total=T,
        ),
        grid=(B, nt),
        in_specs=x_specs + w_specs,
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_p, x_p, x_p, *flat)
    return out[:, :T]
