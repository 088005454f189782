"""Prosody predictors: duration (deterministic + stochastic), pitch, energy.

Behavioral contracts:
  * DurationPredictor — 2×(conv k3 → relu → LN → dropout) → 1-ch proj over
    log(dur+1); input stop-gradient; speaker-conditioned (models.py:99-133)
  * StochasticDurationPredictor — flow-based NLL/sampling duration model;
    present for API parity with use_sdp (models.py:18-96; dead in the
    reference default config but fully functional here)
  * PitchPredictor — 6-layer rel-pos transformer → 1-ch proj of normalized
    log-F0 (models.py:473-514; n_layers hardcoded 6 at models.py:498)
  * VariancePredictor / EnergyPredictor — FastSpees2-style conv768 stack
    (frame_prior_network.py:58-124; the reference's unused proj Linear(1,C)
    dead parameter is intentionally not reproduced)
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.attention import Encoder
from vispeech_tpu.ops.ddsconv import DDSConv
from vispeech_tpu.ops.flows import ConvFlow, ElementwiseAffine, Flip, Log
from vispeech_tpu.ops.layers import Conv1d, LayerNorm

Array = jax.Array


class DurationPredictor(nn.Module):
    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.5
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(x.shape[-1], 1, name="cond")(g)
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(name="norm_1")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv_2")(x * x_mask)
        x = jax.nn.relu(x)
        x = LayerNorm(name="norm_2")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = Conv1d(1, 1, name="proj")(x * x_mask)
        return x * x_mask


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model (reference models.py:18-96).

    forward (reverse=False): returns per-utterance NLL + posterior logq.
    reverse: samples logw from noise scaled by noise_scale.
    """

    in_channels: int
    filter_channels: int  # note: reference overrides this to in_channels
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference models.py:21 quirk
        self.log_flow = Log()
        self.pre_affine = ElementwiseAffine(2)
        self.flows_conv = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3) for _ in range(self.n_flows)
        ]
        self.flows_flip = [Flip() for _ in range(self.n_flows)]

        self.post_pre = Conv1d(fc, 1)
        self.post_proj = Conv1d(fc, 1)
        self.post_convs = DDSConv(fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout)
        self.post_affine = ElementwiseAffine(2)
        self.post_flows_conv = [
            ConvFlow(2, fc, self.kernel_size, n_layers=3) for _ in range(4)
        ]
        self.post_flows_flip = [Flip() for _ in range(4)]

        self.pre = Conv1d(fc, 1)
        self.proj = Conv1d(fc, 1)
        self.convs = DDSConv(fc, self.kernel_size, n_layers=3, p_dropout=self.p_dropout)
        if self.gin_channels:
            self.cond = Conv1d(fc, 1)

    def __call__(
        self,
        x: Array,
        x_mask: Array,
        w: Optional[Array] = None,
        g: Optional[Array] = None,
        reverse: bool = False,
        noise_scale: float = 1.0,
        deterministic: bool = True,
    ):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None and self.gin_channels:
            x = x + self.cond(jax.lax.stop_gradient(g))
        x = self.convs(x, x_mask, deterministic=deterministic)
        x = self.proj(x) * x_mask

        if not reverse:
            assert w is not None
            B, T, _ = x.shape
            h_w = self.post_pre(w)
            h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
            h_w = self.post_proj(h_w) * x_mask
            e_q = (
                jax.random.normal(self.make_rng("sample"), (B, T, 2), x.dtype) * x_mask
            )
            z_q = e_q
            logdet_tot_q = jnp.zeros(B, x.dtype)
            cond_q = x + h_w
            z_q, ld = self.post_affine(z_q, x_mask, g=cond_q)
            logdet_tot_q += ld
            for conv, flip in zip(self.post_flows_conv, self.post_flows_flip):
                z_q, ld = conv(z_q, x_mask, g=cond_q, deterministic=deterministic)
                logdet_tot_q += ld
                z_q, ld = flip(z_q, x_mask)
                logdet_tot_q += ld
            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2),
            )
            logq = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask, axis=(1, 2))
                - logdet_tot_q
            )

            logdet_tot = jnp.zeros(B, x.dtype)
            z0, ld = self.log_flow(z0, x_mask)
            logdet_tot += ld
            z = jnp.concatenate([z0, z1], axis=-1)
            z, ld = self.pre_affine(z, x_mask, g=x)
            logdet_tot += ld
            for conv, flip in zip(self.flows_conv, self.flows_flip):
                z, ld = conv(z, x_mask, g=x, deterministic=deterministic)
                logdet_tot += ld
                z, ld = flip(z, x_mask)
                logdet_tot += ld
            nll = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, axis=(1, 2))
                - logdet_tot
            )
            return nll + logq

        # reverse: undo flows in reverse order; the reference drops the first
        # ConvFlow's inverse from the sampling path ("remove a useless vflow",
        # models.py:89-90) — reproduce that exact sequence:
        #   flip⁻¹, conv3⁻¹, flip⁻¹, conv2⁻¹, flip⁻¹, conv1⁻¹, flip⁻¹, affine⁻¹
        B, T, _ = x.shape
        z = (
            jax.random.normal(self.make_rng("sample"), (B, T, 2), x.dtype)
            * noise_scale
        )
        for i in reversed(range(1, self.n_flows)):
            z = self.flows_flip[i](z, x_mask, reverse=True)
            z = self.flows_conv[i](z, x_mask, g=x, reverse=True, deterministic=deterministic)
        z = self.flows_flip[0](z, x_mask, reverse=True)
        z = self.pre_affine(z, x_mask, g=x, reverse=True)
        logw = z[..., :1]
        return logw


class PitchPredictor(nn.Module):
    hidden_channels: int
    filter_channels: int
    n_heads: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0
    n_layers: int = 6  # hardcoded in the reference (models.py:498)
    use_pallas: Optional[bool] = None  # attention kernel policy (ops/policy.py)
    use_pallas_train: bool = False     # trainable fused attention (custom VJP)

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(self.hidden_channels, 1, name="cond")(g)
        x = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            use_pallas=self.use_pallas,
            use_pallas_train=self.use_pallas_train,
            name="pitch_net",
        )(x * x_mask, x_mask, deterministic=deterministic)
        x = x * x_mask
        pred_lf0 = Conv1d(1, 1, name="proj_f0")(x)
        return pred_lf0[..., 0]  # [B, N]


class VariancePredictor(nn.Module):
    """FastSpeech2-style variance stack (frame_prior_network.py:58-109)."""

    filter_size: int = 768
    kernel: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = Conv1d(self.filter_size, self.kernel, name="conv_1")(x)
        y = jax.nn.relu(y)
        y = LayerNorm(name="ln_1")(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Conv1d(self.filter_size, self.kernel, name="conv_2")(y)
        y = jax.nn.relu(y)
        y = LayerNorm(name="ln_2")(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = nn.Dense(1, name="linear")(y)
        return y[..., 0]  # [B, N]


class EnergyPredictor(nn.Module):
    """Energy head: speaker-conditioned VariancePredictor
    (frame_prior_network.py:112-124; only g is detached, not the input)."""

    input_size: int
    gin_channels: int = 0

    @nn.compact
    def __call__(
        self,
        x: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if g is not None and self.gin_channels:
            g = jax.lax.stop_gradient(g)
            x = x + Conv1d(self.input_size, 1, name="cond")(g)
        return VariancePredictor(name="predictor")(x, deterministic=deterministic)
