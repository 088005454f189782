"""Normalizing-flow layers: Log, Flip, ElementwiseAffine, mean-only residual
coupling, and the spline ConvFlow (reference modules.py:259-390).

Flow protocol: ``layer(x, x_mask, g=…, reverse=False)`` returns
``(y, logdet)`` forward and ``y`` in reverse — matching the reference so the
SynthesizerTrn composition reads identically.  Layout [B, T, C]; channel
flips/splits act on the last axis.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.ddsconv import DDSConv
from vispeech_tpu.ops.layers import Conv1d
from vispeech_tpu.ops.spline import piecewise_rational_quadratic_transform
from vispeech_tpu.ops.wavenet import WN

Array = jax.Array


class Log(nn.Module):
    """y = log(clamp(x, 1e-5)); reverse y = exp(x) (reference modules.py:259-267)."""

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    """Channel-axis flip (reference modules.py:270-277)."""

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse=False, deterministic=True):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros(x.shape[0], dtype=x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    """Per-channel affine with learned (m, logs) (reference modules.py:280-295)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only by default here) coupling over a channel split,
    parameterized by a WN stack (reference modules.py:298-343)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False
    trainable_fused_wn: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            p_dropout=self.p_dropout,
            trainable_fused=self.trainable_fused_wn,
            name="enc",
        )(h, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(
            half * (2 - int(self.mean_only)), 1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="post",
        )(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m, logs = stats, jnp.zeros_like(stats)

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """Half-split coupling with rational-quadratic spline transform of the
    second half (reference modules.py:346-390)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        reverse: bool = False,
        deterministic: bool = True,
    ):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers,
            p_dropout=0.0, name="convs",
        )(h, x_mask, g=g, deterministic=deterministic)
        h = Conv1d(
            half * (self.num_bins * 3 - 1), 1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="proj",
        )(h) * x_mask

        B, T, _ = x0.shape
        # [B, T, half, 3K−1]
        h = h.reshape(B, T, half, self.num_bins * 3 - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1_new, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound,
        )
        x_out = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
        if not reverse:
            logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
            return x_out, logdet
        return x_out
