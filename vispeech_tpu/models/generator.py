"""HiFi-GAN-style upsampling vocoder (reference models.py:244-297).

conv_pre k7 → [leaky(0.1) → weight-norm ConvTranspose (rates 8,8,4,2) → MRF
(3 ResBlock1, kernels 3/7/11, dil 1/3/5, averaged)] ×4 → leaky(0.01 — torch's
default slope at models.py:286) → conv_post k7 (no bias) → tanh.
Speaker conditioning added after conv_pre.  512× total upsampling = hop length.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import Conv1d, WNConvTranspose1d
from vispeech_tpu.ops.resblock import ResBlock1, ResBlock2, leaky_relu

Array = jax.Array


class Generator(nn.Module):
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_rates: Tuple[int, ...] = (8, 8, 4, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    gin_channels: int = 0
    # Differentiable polyphase-folded MRF (ops/folded_mrf.py — pure XLA)
    # for the narrow stages (C<=64) in TRAINING: same math, 128-wide
    # matmuls; the Pallas kernels stay inference-only (no VJP)
    folded_narrow: bool = False

    @nn.compact
    def __call__(
        self, x: Array, g: Optional[Array] = None, fused: bool = False,
        folded: Optional[bool] = None, tail_f32: bool = False,
    ) -> Array:
        """``fused=True`` runs each MRF stage as one Pallas kernel
        (ops/pallas/mrf_stage.py) — inference-only (no VJP); identical
        parameters and output to the XLA path (tested).  resblock "1" only.
        ``folded`` selects the differentiable polyphase-folded MRF for the
        narrow stages; None falls back to the module's ``folded_narrow``
        (the training default) — serving passes an explicit value so a
        train.* config flag never changes inference dispatch."""
        num_kernels = len(self.resblock_kernel_sizes)
        block = ResBlock1 if self.resblock == "1" else ResBlock2
        fused = fused and self.resblock == "1"
        if folded is None:
            folded = self.folded_narrow
        folded_narrow = folded and self.resblock == "1"

        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x)
            x = WNConvTranspose1d(ch, k, u, name=f"up_{i}")(x)
            blocks = [
                block(ch, rk, tuple(rd), name=f"res_{i}_{j}")
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                )
            ]
            # Measured dispatch policy (TPU v5e, batch 8 × 1408 frames):
            # XLA runs the ≥128-channel stages fastest (its conv fusion is
            # near-roofline there); the channel-major Pallas kernel wins at
            # C=64 where XLA is HBM-bound on 18 narrow convs; below 64 the
            # polyphase-folded path wins — fold samples into channels so
            # every matmul is 128 wide (ops/folded_mrf.py).
            fold = max(1, 128 // ch)
            if (fused or folded_narrow) and ch < 64 and x.shape[1] % fold == 0:
                from vispeech_tpu.ops.folded_mrf import mrf_stage_folded

                packed = tuple(b(x, collect=True) for b in blocks)
                x = mrf_stage_folded(
                    x, packed,
                    kernel_sizes=tuple(self.resblock_kernel_sizes),
                    dilations=tuple(
                        tuple(d) for d in self.resblock_dilation_sizes
                    ),
                    fold=fold,
                )
            elif fused and ch == 64:
                from vispeech_tpu.ops.pallas.mrf_stage import mrf_stack

                packed = tuple(b(x, collect=True) for b in blocks)
                x = mrf_stack(
                    x, packed,
                    kernel_sizes=tuple(self.resblock_kernel_sizes),
                    dilations=tuple(
                        tuple(d) for d in self.resblock_dilation_sizes
                    ),
                    interpret=jax.default_backend() != "tpu",
                )
            elif folded_narrow and ch == 64 and x.shape[1] % 2 == 0:
                from vispeech_tpu.ops.folded_mrf import mrf_stage_folded

                packed = tuple(b(x, collect=True) for b in blocks)
                x = mrf_stage_folded(
                    x, packed,
                    kernel_sizes=tuple(self.resblock_kernel_sizes),
                    dilations=tuple(
                        tuple(d) for d in self.resblock_dilation_sizes
                    ),
                    fold=2,
                )
            else:
                acc = None
                for b in blocks:
                    y = b(x)
                    acc = y if acc is None else acc + y
                x = acc / num_kernels
        if tail_f32:
            # bf16-decoder mode: the final conv + tanh run in f32 so the
            # output waveform is continuous-valued — a bf16-quantized
            # waveform (7 mantissa bits, ≈-48 dB noise floor) hands the f32
            # discriminator a trivial real/fake separator and the GAN rails
            # (benchmarks/artifacts/bf16_diag/stage_matrix.json: dec-only
            # bf16 collapses @770 while every encoder stage converges)
            x = x.astype(jnp.float32)
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default (models.py:286)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)  # [B, T*prod(rates), 1]
