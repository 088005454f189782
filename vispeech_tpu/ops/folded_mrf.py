"""Polyphase channel-folded MRF stage — the narrow-channel vocoder tail.

The last HiFi-GAN stages (reference models.py:266-284) run 18 convolutions
at C=32 over ~0.7M samples.  A [T, 32] @ [32, 32] matmul fills 1/16 of the
MXU's 128×128 tiles, so even a perfectly-fused kernel tops out near 25% of
peak.  This module trades FLOPs for MXU width: reshape ``fold`` consecutive
samples into the channel axis (polyphase decomposition), so the stage
computes in a [T/fold, fold·C] layout where every matmul is 128 wide.

A dilated conv in sample space becomes a conv in folded space whose taps are
block-Toeplitz mixes of the original kernel: output phase p at folded frame
t' reads input phase q = (p + offset) mod fold at frame t' + (p+offset)//fold
for every original tap offset.  The folded kernel is therefore

    Wf[m, q·C+ci, p·C+co] = Σ_j  w[j, ci, co] · [ (p+off_j)//fold == m
                                                  and (p+off_j)%fold == q ]

built by einsum with a static 0/1 scatter tensor.  Zero padding in folded
frames equals zero padding in samples, so SAME-conv edge semantics are
exact — the folded stage is bit-equivalent in exact arithmetic to the XLA
ResBlock path (tested in float32, tests/test_pallas_kernels.py).

FLOP inflation is Σ(taps_folded·fold)/Σk ≈ 2.6× at fold=4 for the k=3/7/11,
d=1/3/5 MRF — but XLA runs the 128-wide convs ~4× faster than the 32-wide
ones, a net win measured at ~1.5× on TPU v5e.  Pure XLA (conv_general_
dilated), differentiable, works on any backend.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BranchWeights = Tuple[Array, Array, Array, Array]  # w1 [U,k,C,C], b1 [U,1,C], w2, b2


def _leaky(x: Array, slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * slope)


def _fold_scatter(k: int, dilation: int, fold: int) -> Tuple[np.ndarray, int]:
    """Static 0/1 tensor S[j, m, q, p] mapping original tap j to folded tap m
    with input phase q for output phase p, plus the left pad (in folded
    frames).  Offsets are centered: off_j = (j - (k-1)//2) · dilation."""
    c = (k - 1) // 2
    offsets = (np.arange(k) - c) * dilation
    pos = offsets[:, None] + np.arange(fold)[None, :]  # [j, p] = p + off_j
    m = np.floor_divide(pos, fold)
    q = pos - m * fold
    m_min, m_max = int(m.min()), int(m.max())
    kf = m_max - m_min + 1
    s = np.zeros((k, kf, fold, fold), np.float32)
    for j in range(k):
        for p in range(fold):
            s[j, m[j, p] - m_min, q[j, p], p] = 1.0
    return s, -m_min  # pad_lo; pad_hi = kf - 1 - pad_lo


def fold_conv_weights(
    w: Array, b: Array, dilation: int, fold: int
) -> Tuple[Array, Array, Tuple[int, int]]:
    """(Wf [kf, fold·Cin, fold·Cout], bf [fold·Cout], (pad_lo, pad_hi)) for a
    SAME-padded conv with kernel ``w`` [k, Cin, Cout], bias ``b`` [Cout]."""
    k, cin, cout = w.shape
    s, pad_lo = _fold_scatter(k, dilation, fold)
    kf = s.shape[1]
    sj = jnp.asarray(s, w.dtype)
    wf = jnp.einsum("kio,kmqp->mqipo", w, sj).reshape(kf, fold * cin, fold * cout)
    bf = jnp.tile(b, fold)
    return wf, bf, (pad_lo, kf - 1 - pad_lo)


def _conv_folded(x: Array, wf: Array, bf: Array, pad: Tuple[int, int]) -> Array:
    # Weights are folded in param dtype (f32) then cast to the activation
    # dtype — mirrors the fused Pallas MRF kernel (ops/pallas/mrf_stage.py)
    # so the bf16 serving path is policy-equivalent.  The conv runs dtype-
    # matched WITHOUT preferred_element_type: the MXU accumulates f32
    # internally for bf16 operands anyway, and a f32-preferred output makes
    # the conv TRANSPOSE mix dtypes (bf16 operand × f32 cotangent —
    # TypeError under grad; hit by the bf16 dec_body training path).
    y = jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype), window_strides=(1,), padding=(pad,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bf.astype(x.dtype)


def mrf_stage_folded(
    x: Array,
    packed: Sequence[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    fold: int,
) -> Array:
    """One full MRF stage (3 ResBlock1 branches averaged) in folded layout.

    ``packed`` per branch: (w1 [U,k,C,C], b1 [U,1,C], w2, b2) — the exact
    weight-norm-folded parameters the XLA path trains (ResBlock1
    ``collect=True``, ops/resblock.py).  x: [B, T, C], T % fold == 0.

    Kernels are re-folded on every call by design: params are traced jit
    inputs (so the op stays differentiable and checkpoint-swappable), and the
    einsum fold is O(k·fold²·C²) ≈ 0.01% of the stage's conv FLOPs at C=32
    over ~0.7M samples — pre-folding at load time would save nothing
    measurable while complicating the parameter contract.
    """
    B, T, C = x.shape
    if T % fold:
        raise ValueError(f"T={T} not divisible by fold={fold}")
    x0 = x.reshape(B, T // fold, fold * C)
    acc = None
    for (w1, b1, w2, b2), k, dils in zip(packed, kernel_sizes, dilations):
        xb = x0
        for j, d in enumerate(dils):
            wf1, bf1, p1 = fold_conv_weights(w1[j], b1[j, 0], d, fold)
            wf2, bf2, p2 = fold_conv_weights(w2[j], b2[j, 0], 1, fold)
            h = _conv_folded(_leaky(xb), wf1, bf1, p1)
            h = _conv_folded(_leaky(h), wf2, bf2, p2)
            xb = xb + h
        acc = xb if acc is None else acc + xb
    return (acc / len(packed)).reshape(B, T, C)
