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
    """``use_pallas``: None = auto (fused single-kernel stack on TPU when
    dropout is inactive and dilation_rate==1 — every WN in this model);
    True forces it (interpret mode off-TPU, for tests); False disables."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    use_pallas: Optional[bool] = None
    # differentiable fused stack for TRAINING (custom VJP,
    # ops/pallas/wn_stack_train.py); requires p_dropout == 0 (dropout would
    # change the math) and dilation_rate == 1 — both true for every WN here
    trainable_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mask: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        C = self.hidden_channels
        # inference-only fused path: the kernel defines no JVP
        pallas_ok = self.dilation_rate == 1 and deterministic
        import os

        use_pallas = (
            self.use_pallas
            if self.use_pallas is not None
            else (
                pallas_ok
                and jax.default_backend() == "tpu"
                and not os.environ.get("VISPEECH_DISABLE_PALLAS")
            )
        )
        if use_pallas and pallas_ok:
            return self._fused(x, x_mask, g)
        if (
            self.trainable_fused
            and self.dilation_rate == 1
            and self.p_dropout == 0.0
            # bf16 inputs are fine: the kernel upcasts every operand to f32
            # at the pallas_call boundary and runs fwd+bwd in f32, so under
            # the bf16 policy this path is numerically SAFER than the XLA
            # bf16 loop it used to fall back to (validated in
            # tests/test_wn_train.py::test_wn_stack_train_bf16_grads)
            #
            # off-TPU the kernel only exists in interpret mode (orders of
            # magnitude slower than the XLA loop, and now the DEFAULT config
            # enables trainable_fused) — CPU training/tests keep XLA; the
            # kernel itself is still interpret-tested in tests/test_wn_train
            and jax.default_backend() == "tpu"
        ):
            return self._fused(x, x_mask, g, trainable=True)
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

    def _fused(
        self, x: Array, x_mask: Array, g: Optional[Array],
        trainable: bool = False,
    ) -> Array:
        """Single-kernel path: same submodules/params as the XLA loop above,
        weights stacked and streamed through ops/pallas/wn_stack.py (or its
        differentiable twin wn_stack_train when ``trainable``)."""
        from vispeech_tpu.ops.pallas.wn_stack import pack_wn_weights, wn_stack

        C = self.hidden_channels
        L = self.n_layers
        B = x.shape[0]
        kernels, biases, rs_kernels, rs_biases = [], [], [], []
        for i in range(L):
            kern, bias = WNConv1d(
                2 * C, self.kernel_size, dilation=1, name=f"in_{i}"
            ).effective_weights(C)
            kernels.append(kern)
            biases.append(bias)
            cout = 2 * C if i < L - 1 else C
            rk, rb = WNConv1d(cout, 1, name=f"res_skip_{i}").effective_weights(C)
            rs_kernels.append(rk)
            rs_biases.append(rb)
        w_in, b_in, w_rs, b_rs = pack_wn_weights(
            kernels, biases, rs_kernels, rs_biases, C
        )
        cond = jnp.broadcast_to(b_in[None], (B, L, 2 * C))
        if g is not None:
            ck, cb = WNConv1d(
                2 * C * L, 1, name="cond_layer"
            ).effective_weights(g.shape[-1])
            g_vec = (
                jnp.einsum("bsg,gm->bm", g.astype(jnp.float32), ck[0]) + cb
            )  # g is [B, 1, G]
            cond = cond + g_vec.reshape(B, L, 2 * C)
        if trainable:
            from vispeech_tpu.ops.pallas.wn_stack_train import wn_stack_train

            return wn_stack_train(
                x, x_mask, cond, w_in, w_rs, b_rs, self.kernel_size,
                interpret=jax.default_backend() != "tpu",
                # bf16 policy: matmul operands at bf16 MXU rate inside the
                # kernel, accumulators/carries f32 (wn_stack_train docstring)
                bf16_compute=x.dtype == jnp.bfloat16,
            ).astype(x.dtype)
        return wn_stack(
            x, x_mask, cond, w_in, w_rs, b_rs, self.kernel_size,
            interpret=jax.default_backend() != "tpu",
        ).astype(x.dtype)
