"""Relative-position multi-head attention and the post-norm conv-FFN
transformer encoder used at phoneme and frame resolution.

Behavioral contract (reference attentions.py:13-99, 101-254):
  * window_size=4 shared relative key/value embeddings (heads_share)
  * relative logits folded into absolute position via the standard
    pad-reshape skew, masked fill −1e4, softmax, relative-value correction
  * encoder blocks are post-norm: x = LN(x + Attn(x)); x = LN(x + FFN(x))
  * FFN is a masked k-wide conv → relu → conv with asymmetric SAME padding

TPU notes: QK/AV contractions are batched matmuls on the MXU; the relative
terms use gathers of a [2w+1, d] table broadcast over heads.  Sequences are
bucket-padded so shapes stay static.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import Conv1d, LayerNorm

from vispeech_tpu.ops.precision import get_matmul_precision

Array = jax.Array


def xavier_uniform_conv1x1(key, shape, dtype=jnp.float32):
    """Matches torch xavier_uniform_ on a 1×1 conv weight [cout, cin, 1]."""
    _, cin, cout = shape
    bound = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _pad_rel_embeddings(rel: Array, length: int, window_size: int) -> Array:
    """Slice/pad the [2w+1, d] table to [2L−1, d] (reference attentions.py:199-212)."""
    pad = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad > 0:
        rel = jnp.pad(rel, ((pad, pad), (0, 0)))
    return jax.lax.dynamic_slice_in_dim(rel, start, 2 * length - 1, axis=0)


def _relative_to_absolute(x: Array) -> Array:
    """[B, H, L, 2L−1] → [B, H, L, L] via the pad-reshape skew
    (reference attentions.py:214-229)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _absolute_to_relative(x: Array) -> Array:
    """[B, H, L, L] → [B, H, L, 2L−1] (reference attentions.py:231-243)."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _pallas_attention_viable(key_mask) -> bool:
    """Auto-selection (``use_pallas=None``) for raw modules: the fused Pallas
    path runs on TPU backends.  Explicit policy (ops/policy.py) is preferred —
    the Synthesizer threads it through — and env escape hatches are honored
    only there, never here in traced code paths."""
    from vispeech_tpu.ops.policy import default_serving_policy

    return bool(default_serving_policy().attn_pallas) and key_mask is not None


class MultiHeadAttention(nn.Module):
    """Self/cross attention with optional windowed relative embeddings.

    ``use_pallas``: None = auto (fused Pallas kernel on TPU for deterministic
    self-attention with relative bias — the FramePriorNet inference hot path);
    True forces it (interpret mode off-TPU, for tests); False disables.
    """

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    heads_share: bool = True
    proximal_bias: bool = False
    block_length: Optional[int] = None
    use_pallas: Optional[bool] = None
    # trainable fused kernel (custom VJP + in-kernel dropout) for the
    # NON-deterministic path — the measured top training stage
    # (benchmarks/artifacts/train_stages_bf16.json); off-TPU it falls back
    # to XLA whenever dropout is live (the CPU interpreter has no PRNG)
    use_pallas_train: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        c: Array,
        attn_mask: Optional[Array] = None,
        deterministic: bool = True,
        key_mask: Optional[Array] = None,
    ) -> Array:
        # x, c: [B, T, C]; attn_mask: [B, 1, T_t, T_s] or broadcastable
        d_k = self.channels // self.n_heads
        q = Conv1d(self.channels, 1, kernel_init=xavier_uniform_conv1x1, name="conv_q")(x)
        k = Conv1d(self.channels, 1, kernel_init=xavier_uniform_conv1x1, name="conv_k")(c)
        v = Conv1d(self.channels, 1, kernel_init=xavier_uniform_conv1x1, name="conv_v")(c)

        B, T_t, _ = q.shape
        T_s = k.shape[1]
        # [B, H, T, d]
        qh = q.reshape(B, T_t, self.n_heads, d_k).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T_s, self.n_heads, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T_s, self.n_heads, d_k).transpose(0, 2, 1, 3)

        # strictly inference-only (no JVP rule on the kernel; training keeps
        # the XLA path so autodiff and attention dropout work)
        pallas_ok = (
            self.window_size is not None
            and T_s == T_t
            and not self.proximal_bias
            and self.block_length is None
            and deterministic
            and key_mask is not None
        )
        use_pallas = (
            self.use_pallas
            if self.use_pallas is not None
            else (pallas_ok and _pallas_attention_viable(key_mask))
        )
        if use_pallas and pallas_ok:
            from vispeech_tpu.ops.pallas.flash_attention import (
                relative_self_attention,
            )

            n_rel = 1 if self.heads_share else self.n_heads
            rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            out = relative_self_attention(
                qh, kh, vh, rel_k, rel_v, key_mask,
                window=self.window_size,
                interpret=jax.default_backend() != "tpu",
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T_t, self.channels)
            return Conv1d(
                self.out_channels, 1, kernel_init=xavier_uniform_conv1x1,
                name="conv_o",
            )(out)

        rate = 0.0 if deterministic else self.p_dropout
        train_kernel_ok = (
            self.use_pallas_train
            and self.window_size is not None
            and T_s == T_t
            and not self.proximal_bias
            and self.block_length is None
            and not deterministic
            and key_mask is not None
            # TPU only: off-TPU the kernel would run in interpret mode
            # (orders of magnitude slower than XLA); the kernel itself is
            # interpret-tested directly in tests/test_flash_attn_train.py
            and jax.default_backend() == "tpu"
        )
        if train_kernel_ok:
            from vispeech_tpu.ops.pallas.flash_attention_train import (
                relative_self_attention_train,
            )

            n_rel = 1 if self.heads_share else self.n_heads
            rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            if rate > 0.0:
                # seed rides a float32 carrier into the kernel: keep it
                # < 2^23 so the int value is exactly representable (larger
                # draws quantize, letting two layers share dropout streams)
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2 ** 23
                ).astype(jnp.float32)
            else:
                seed = jnp.float32(0)
            # VMEM budget: the bwd kernel keeps ~6 [block_q, T] f32
            # temporaries + 7 [T, d] buffers live per program; block_q=128
            # overflows the 16 MB scoped limit above T≈1024 (observed OOM
            # at T=1280, B=12), so shrink the q-block as T grows.
            block_q = 128 if T_t <= 1024 else 64
            out = relative_self_attention_train(
                qh, kh, vh, rel_k, rel_v,
                key_mask.astype(jnp.float32), seed, rate,
                window=self.window_size,
                block_q=block_q,
                interpret=jax.default_backend() != "tpu",
                # bf16 policy: bf16 matmul operands inside the kernel at the
                # doubled MXU rate; softmax/accumulators stay f32
                bf16_compute=qh.dtype == jnp.bfloat16,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T_t, self.channels)
            return Conv1d(
                self.out_channels, 1, kernel_init=xavier_uniform_conv1x1,
                name="conv_o",
            )(out)

        scale = 1.0 / math.sqrt(d_k)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qh * scale, kh, precision=get_matmul_precision()
        )

        if self.window_size is not None:
            assert T_s == T_t, "relative attention requires self-attention"
            n_rel = 1 if self.heads_share else self.n_heads
            rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * (d_k ** -0.5),
                (n_rel, 2 * self.window_size + 1, d_k),
            )
            rk = jax.vmap(lambda r: _pad_rel_embeddings(r, T_t, self.window_size))(rel_k)
            # [B, H, T, 2T−1] = q · rel_kᵀ
            rel_logits = jnp.einsum(
                "bhtd,hmd->bhtm", qh * scale, rk.astype(qh.dtype),
                precision=get_matmul_precision(),
            )
            scores = scores + _relative_to_absolute(rel_logits)

        if self.proximal_bias:
            r = jnp.arange(T_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None]

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                t = jnp.arange(T_s)
                band = (jnp.abs(t[None, :] - t[:, None]) <= self.block_length)
                scores = jnp.where(band[None, None], scores, -1e4)

        # f32-internal softmax: under the bf16 training policy the exp/sum
        # must not accumulate in bf16 (torch autocast fp32-lists softmax too)
        p_attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhts,bhsd->bhtd", p_attn, vh, precision=get_matmul_precision()
        )

        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)  # [B, H, T, 2T−1]
            rv = jax.vmap(lambda r: _pad_rel_embeddings(r, T_t, self.window_size))(rel_v)
            out = out + jnp.einsum(
                "bhtm,hmd->bhtd", rel_weights, rv.astype(out.dtype),
                precision=get_matmul_precision(),
            )

        out = out.transpose(0, 2, 1, 3).reshape(B, T_t, self.channels)
        return Conv1d(
            self.out_channels, 1, kernel_init=xavier_uniform_conv1x1, name="conv_o"
        )(out)


class FFN(nn.Module):
    """Masked conv-FFN (reference attentions.py:257-303)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False

    def _pad(self, x: Array) -> Array:
        if self.kernel_size == 1:
            return x
        if self.causal:
            return jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        left = (self.kernel_size - 1) // 2
        right = self.kernel_size // 2
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, deterministic: bool = True) -> Array:
        y = Conv1d(self.filter_channels, self.kernel_size, padding=(0, 0), name="conv_1")(
            self._pad(x * x_mask)
        )
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
        y = Conv1d(self.out_channels, self.kernel_size, padding=(0, 0), name="conv_2")(
            self._pad(y * x_mask)
        )
        return y * x_mask


class Decoder(nn.Module):
    """Causal transformer decoder: proximal-biased causal self-attention,
    cross-attention over encoder states, causal conv-FFN — post-norm
    (reference attentions.py:50-99; API-surface parity, unused by the
    Synthesizer just as in the reference)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,        # [B, T_t, C]
        x_mask: Array,   # [B, T_t, 1]
        h: Array,        # [B, T_s, C] encoder states
        h_mask: Array,   # [B, T_s, 1]
        deterministic: bool = True,
    ) -> Array:
        T_t = x.shape[1]
        causal = jnp.tril(jnp.ones((T_t, T_t), x.dtype))
        self_mask = (
            x_mask[:, None, :, 0, None] * x_mask[:, None, None, :, 0]
        ) * causal[None, None]
        cross_mask = x_mask[:, None, :, 0, None] * h_mask[:, None, None, :, 0]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                name=f"self_attn_{i}",
            )(x, x, self_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm0_{i}")(x + y)

            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, name=f"cross_attn_{i}",
            )(x, h, cross_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + y)

            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, causal=True, name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask


class FFT(nn.Module):
    """Causal self-attention + causal conv-FFN stack (reference
    attentions.py:303-349; API-surface parity)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False

    @nn.compact
    def __call__(
        self, x: Array, x_mask: Array, deterministic: bool = True
    ) -> Array:
        T = x.shape[1]
        causal = jnp.tril(jnp.ones((T, T), x.dtype))
        attn_mask = (
            x_mask[:, None, :, 0, None] * x_mask[:, None, None, :, 0]
        ) * causal[None, None]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                name=f"self_attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm0_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                p_dropout=self.p_dropout, causal=True, name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + y)
        return x * x_mask


class Encoder(nn.Module):
    """Post-norm transformer encoder with windowed relative attention
    (reference attentions.py:13-47)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    use_pallas: Optional[bool] = None
    use_pallas_train: bool = False

    @nn.compact
    def __call__(self, x: Array, x_mask: Array, deterministic: bool = True) -> Array:
        # [B, 1, T, T]: outer product of the mask with itself
        m = x_mask[:, :, 0]  # [B, T]
        attn_mask = m[:, None, :, None] * m[:, None, None, :]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                use_pallas=self.use_pallas,
                use_pallas_train=self.use_pallas_train,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic, key_mask=m)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm1_{i}")(x + y)

            y = FFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = LayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask
