"""Dilated depth-separable conv stack (reference modules.py:70-108)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import Conv1d, LayerNorm

Array = jax.Array


class DDSConv(nn.Module):
    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                feature_group_count=self.channels,
                name=f"sep_{i}",
            )(x * x_mask)
            y = LayerNorm(name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"pw_{i}")(y)
            y = LayerNorm(name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask
