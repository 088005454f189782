"""HiFi-GAN multi-receptive-field residual blocks (reference modules.py:187-256)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import WNConv1d, normal_init

Array = jax.Array

LRELU_SLOPE = 0.1


def leaky_relu(x: Array, slope: float = LRELU_SLOPE) -> Array:
    return jnp.where(x >= 0, x, x * slope)


class ResBlock1(nn.Module):
    """3×(dilated conv + plain conv) residual stack (reference modules.py:187-229).

    ``collect=True`` returns the packed effective (weight-norm-folded)
    parameters — (w1 [U,k,C,C], b1 [U,1,C], w2, b2) — instead of applying the
    block, so the fused Pallas MRF stage (ops/pallas/mrf_stage.py) consumes
    the exact parameters the XLA path trains.
    """

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(
        self, x: Array, x_mask: Optional[Array] = None, collect: bool = False
    ):
        if collect:
            w1s, b1s, w2s, b2s = [], [], [], []
        for j, d in enumerate(self.dilation):
            c1 = WNConv1d(
                self.channels, self.kernel_size, dilation=d,
                kernel_init=normal_init(0.01), name=f"conv1_{j}",
            )
            c2 = WNConv1d(
                self.channels, self.kernel_size, dilation=1,
                kernel_init=normal_init(0.01), name=f"conv2_{j}",
            )
            if collect:
                w, b = c1.effective_weights(self.channels)
                w1s.append(w)
                b1s.append(b[None, :])
                w, b = c2.effective_weights(self.channels)
                w2s.append(w)
                b2s.append(b[None, :])
                continue
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = c1(xt)
            xt = leaky_relu(xt)
            if x_mask is not None:
                xt = xt * x_mask
            xt = c2(xt)
            x = xt + x
        if collect:
            return (
                jnp.stack(w1s), jnp.stack(b1s), jnp.stack(w2s), jnp.stack(b2s)
            )
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """2×dilated-conv residual stack (reference modules.py:232-256)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x: Array, x_mask: Optional[Array] = None) -> Array:
        for j, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            if x_mask is not None:
                xt = xt * x_mask
            xt = WNConv1d(
                self.channels, self.kernel_size, dilation=d,
                kernel_init=normal_init(0.01), name=f"conv_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x
