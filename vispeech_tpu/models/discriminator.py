"""Multi-period + multi-scale waveform discriminators (reference models.py:300-387).

DiscriminatorP reshapes the wave into period-strided 2-D (periods 2,3,5,7,11,
reflect-padded) and applies 5 weight-norm Conv2d (k 5×1, stride 3×1);
DiscriminatorS is 6 grouped weight-norm Conv1d.  Feature maps are returned for
the feature-matching loss.  Waveforms are [B, T, 1] channels-last.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import WNConv1d, torch_conv_kernel_init
from vispeech_tpu.ops.resblock import leaky_relu

from vispeech_tpu.ops.precision import get_matmul_precision

Array = jax.Array


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d (NHWC) for the period discriminators."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        v = self.param(
            "v",
            lambda key, shape: torch_conv_kernel_init(
                key, (kh * kw, cin, self.features)
            ).reshape(shape),
            (kh, kw, cin, self.features),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))),
            (self.features,),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True) + 1e-12)
        kernel = v * (g / norm)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=get_matmul_precision(),
        )
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-(1.0 / (cin * kh * kw) ** 0.5),
                maxval=(1.0 / (cin * kh * kw) ** 0.5),
            ),
            (self.features,),
        )
        return y + bias.astype(y.dtype)


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        # x: [B, T, 1] → [B, T//p, p, 1]
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = WNConv2d(
                ch, (self.kernel_size, 1), (self.stride, 1), (pad, 0),
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv2d(1024, (self.kernel_size, 1), (1, 1), (pad, 0), name="conv_4")(x)
        x = leaky_relu(x)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        # x: [B, T, 1]
        fmap = []
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, groups, pad) in enumerate(specs):
            x = WNConv1d(
                ch, k, stride=s, feature_group_count=groups, padding=pad,
                name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmap.append(x)
        x = WNConv1d(1, 3, padding=1, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: Array, y_hat: Array):
        """Returns (real_logits, fake_logits, real_fmaps, fake_fmaps).

        Real and fake run through each sub-discriminator as ONE
        concatenated batch (identical math; the reference calls each
        discriminator twice, models.py:374-380) — halves the conv dispatch
        count and doubles the batch the MXU sees; the discriminator is the
        measured top training stage (train_stages_fp32.json)."""
        B = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods
        ]
        for d in discs:
            logit, fmap = d(both)
            y_d_rs.append(logit[:B])
            y_d_gs.append(logit[B:])
            fmap_rs.append([f[:B] for f in fmap])
            fmap_gs.append([f[B:] for f in fmap])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
