"""Non-causal WaveNet stack (``WN``) with fused gated activation.

Behavioral contract (reference modules.py:111-184, commons.py:100-107):
  * n_layers of weight-norm dilated conv (k, dilation=rate^i) → 2C channels
  * global conditioning: one weight-norm 1×1 over g producing 2C per layer
  * gate: tanh(a[:C]) · sigmoid(a[C:]) — fused elementwise (XLA fuses this
    into the conv epilogue on TPU; a Pallas variant exists for the
    inference-critical path)
  * residual+skip 1×1 per layer (last layer emits skip only), mask after
    each residual update
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.layers import WNConv1d

Array = jax.Array


def fused_gate(x: Array, cond: Array, channels: int) -> Array:
    """tanh/sigmoid gated activation (reference commons.py:100-107)."""
    a = x + cond
    return jnp.tanh(a[..., :channels]) * jax.nn.sigmoid(a[..., channels:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        C = self.hidden_channels
        if g is not None:
            # one 1×1 over the conditioning for all layers at once
            g_all = WNConv1d(2 * C * self.n_layers, 1, name="cond_layer")(g)
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = WNConv1d(
                2 * C, self.kernel_size, dilation=dilation, name=f"in_{i}"
            )(x)
            if g is not None:
                g_l = g_all[..., i * 2 * C : (i + 1) * 2 * C]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_gate(x_in, g_l, C)
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=deterministic)
            if i < self.n_layers - 1:
                res_skip = WNConv1d(2 * C, 1, name=f"res_skip_{i}")(acts)
                x = (x + res_skip[..., :C]) * x_mask
                output = output + res_skip[..., C:]
            else:
                output = output + WNConv1d(C, 1, name=f"res_skip_{i}")(acts)
        return output * x_mask
