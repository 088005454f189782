"""Conformer encoder stack (reference frame_prior_network.py:127-602).

The reference carries a full Conformer implementation (ConformerBlock,
Transformer-XL-style RelativeMultiHeadAttention, ConformerConvModule,
sinusoidal PositionalEncoding, GLU/Swish) that models.py never instantiates —
capability surface only (SURVEY.md §2.1).  Rebuilt here TPU-first:
channels-last, static shapes, MXU-batched attention, optional masking, and
the Macaron half-step feed-forward residuals.

Usable as a drop-in alternative frame prior / variance-adapter backbone:

    ConformerEncoder(encoder_dim=192, n_layers=4)(x, x_mask)
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def sinusoidal_positions(length: int, dim: int, dtype=jnp.float32) -> Array:
    """[1, L, D] Transformer sinusoidal table (reference
    PositionalEncoding, frame_prior_network.py:368-390)."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe[None].astype(dtype)


class FeedForwardModule(nn.Module):
    """LN → 4× linear → swish → dropout → linear → dropout
    (frame_prior_network.py:330-365)."""

    dim: int
    expansion_factor: int = 4
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * self.expansion_factor,
                     kernel_init=nn.initializers.xavier_uniform())(y)
        y = y * jax.nn.sigmoid(y)  # swish
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, kernel_init=nn.initializers.xavier_uniform())(y)
        return nn.Dropout(self.p_dropout)(y, deterministic=deterministic)


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL relative attention with u/v biases and the pad-shift
    relative alignment (frame_prior_network.py:393-482)."""

    d_model: int
    n_heads: int
    p_dropout: float = 0.1

    @staticmethod
    def _relative_shift(pos_score: Array) -> Array:
        b, h, t1, t2 = pos_score.shape
        padded = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
        padded = padded.reshape(b, h, t2 + 1, t1)
        return padded[:, :, 1:].reshape(b, h, t1, t2)

    @nn.compact
    def __call__(
        self,
        x: Array,                       # [B, T, D]
        pos_emb: Array,                 # [1, T, D]
        mask: Optional[Array] = None,   # [B, T] (1 = valid)
        deterministic: bool = True,
    ) -> Array:
        B, T, D = x.shape
        H = self.n_heads
        d_head = D // H
        xavier = nn.initializers.xavier_uniform()

        q = nn.Dense(D, kernel_init=xavier, name="query_proj")(x)
        k = nn.Dense(D, kernel_init=xavier, name="key_proj")(x)
        v = nn.Dense(D, kernel_init=xavier, name="value_proj")(x)
        p = nn.Dense(D, use_bias=False, kernel_init=xavier, name="pos_proj")(
            jnp.broadcast_to(pos_emb, (B, T, D))
        )

        q = q.reshape(B, T, H, d_head)
        k = k.reshape(B, T, H, d_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, d_head).transpose(0, 2, 1, 3)
        p = p.reshape(B, T, H, d_head)

        u_bias = self.param("u_bias", xavier, (H, d_head))
        v_bias = self.param("v_bias", xavier, (H, d_head))

        content = jnp.einsum("bthd,bhsd->bhts", q + u_bias[None, None], k)
        pos_score = jnp.einsum("bthd,bshd->bhts", q + v_bias[None, None], p)
        score = (content + self._relative_shift(pos_score)) / math.sqrt(D)

        if mask is not None:
            score = jnp.where(mask[:, None, None, :] > 0, score, -1e9)
        attn = jax.nn.softmax(score, axis=-1)
        attn = nn.Dropout(self.p_dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhts,bhsd->bthd", attn, v).reshape(B, T, D)
        return nn.Dense(D, kernel_init=xavier, name="out_proj")(ctx)


class MultiHeadedSelfAttentionModule(nn.Module):
    """LN → relative MHSA → dropout (frame_prior_network.py:484-520)."""

    d_model: int
    n_heads: int
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        pos = sinusoidal_positions(x.shape[1], self.d_model, x.dtype)
        y = nn.LayerNorm()(x)
        y = RelativeMultiHeadAttention(
            self.d_model, self.n_heads, self.p_dropout, name="attention"
        )(y, pos, mask=mask, deterministic=deterministic)
        return nn.Dropout(self.p_dropout)(y, deterministic=deterministic)


class ConformerConvModule(nn.Module):
    """LN → pointwise 2× → GLU → depthwise k31 → BN → swish → pointwise →
    dropout (frame_prior_network.py:269-311)."""

    dim: int
    kernel_size: int = 31
    expansion_factor: int = 2
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.LayerNorm()(x)
        y = nn.Conv(self.dim * self.expansion_factor, (1,), name="pw1")(y)
        a, b = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)  # GLU
        y = nn.Conv(
            self.dim, (self.kernel_size,),
            feature_group_count=self.dim,
            use_bias=False,
            name="dw",
        )(y)
        y = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, name="bn"
        )(y)
        y = y * jax.nn.sigmoid(y)  # swish
        y = nn.Conv(self.dim, (1,), name="pw2")(y)
        return nn.Dropout(self.p_dropout)(y, deterministic=deterministic)


class ConformerBlock(nn.Module):
    """Macaron FF·½ → MHSA → Conv → FF·½ → LN (frame_prior_network.py:523-602)."""

    encoder_dim: int
    n_heads: int = 8
    ff_expansion: int = 4
    conv_expansion: int = 2
    ff_dropout: float = 0.1
    attn_dropout: float = 0.1
    conv_dropout: float = 0.1
    conv_kernel_size: int = 31
    half_step_residual: bool = True

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        factor = 0.5 if self.half_step_residual else 1.0
        x = x + factor * FeedForwardModule(
            self.encoder_dim, self.ff_expansion, self.ff_dropout, name="ff1"
        )(x, deterministic=deterministic)
        x = x + MultiHeadedSelfAttentionModule(
            self.encoder_dim, self.n_heads, self.attn_dropout, name="mhsa"
        )(x, mask=mask, deterministic=deterministic)
        x = x + ConformerConvModule(
            self.encoder_dim, self.conv_kernel_size, self.conv_expansion,
            self.conv_dropout, name="conv",
        )(x, deterministic=deterministic)
        x = x + factor * FeedForwardModule(
            self.encoder_dim, self.ff_expansion, self.ff_dropout, name="ff2"
        )(x, deterministic=deterministic)
        return nn.LayerNorm()(x)


class ConformerEncoder(nn.Module):
    """Stack of ConformerBlocks, mask-aware — an alternative frame-prior /
    variance backbone with the reference's capability surface."""

    encoder_dim: int
    n_layers: int = 4
    n_heads: int = 8
    conv_kernel_size: int = 31
    p_dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: Array,                      # [B, T, D]
        x_mask: Optional[Array] = None,  # [B, T, 1]
        deterministic: bool = True,
    ) -> Array:
        mask = x_mask[:, :, 0] if x_mask is not None else None
        for i in range(self.n_layers):
            x = ConformerBlock(
                self.encoder_dim,
                n_heads=self.n_heads,
                ff_dropout=self.p_dropout,
                attn_dropout=self.p_dropout,
                conv_dropout=self.p_dropout,
                conv_kernel_size=self.conv_kernel_size,
                name=f"block_{i}",
            )(x, mask=mask, deterministic=deterministic)
            if x_mask is not None:
                x = x * x_mask
        return x
