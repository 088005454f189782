"""Trainable fused WN stack: forward + custom VJP vs XLA autodiff.

The backward Pallas kernel (ops/pallas/wn_stack_train.py) is validated in
interpret mode against jax.grad of a plain-XLA reimplementation of the same
stack semantics (reference modules.py:111-184: gated dilated convs, res/skip,
mask after residual update, masked skip output).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.ops.pallas.wn_stack_train import wn_stack_train


def xla_wn_stack(x, mask, cond, w_in, w_rs, b_rs, kernel_size):
    """Reference semantics in plain lax ops (differentiable)."""
    L = w_in.shape[0]
    C = x.shape[-1]
    skip = jnp.zeros_like(x)
    pad = kernel_size // 2
    for l in range(L):
        acts = jax.lax.conv_general_dilated(
            x, w_in[l], window_strides=(1,), padding=((pad, pad),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + cond[:, l][:, None, :]
        z = jnp.tanh(acts[..., :C]) * jax.nn.sigmoid(acts[..., C:])
        rs = jnp.einsum("btc,cd->btd", z, w_rs[l]) + b_rs[l][None]
        if l < L - 1:
            x = (x + rs[..., :C]) * mask
            skip = skip + rs[..., C:]
        else:
            out = (skip + rs[..., :C]) * mask
    return out


def make_inputs(B=2, T=24, C=8, L=3, k=5, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, T, C).astype(np.float32))
    lens = np.full(B, T)
    lens[-1] = T - 5
    mask = jnp.asarray(
        (np.arange(T)[None, :, None] < lens[:, None, None]).astype(np.float32)
    )
    cond = jnp.asarray(r.randn(B, L, 2 * C).astype(np.float32) * 0.3)
    w_in = jnp.asarray(r.randn(L, k, C, 2 * C).astype(np.float32) * 0.2)
    w_rs = jnp.asarray(r.randn(L, C, 2 * C).astype(np.float32) * 0.2)
    # last layer: skip weights live in [:, :C], rest zeroed (kernel contract)
    w_rs = w_rs.at[L - 1, :, C:].set(0.0)
    b_rs = jnp.asarray(r.randn(L, 1, 2 * C).astype(np.float32) * 0.1)
    b_rs = b_rs.at[L - 1, :, C:].set(0.0)
    return x, mask, cond, w_in, w_rs, b_rs, k


class TestWNTrainKernel:
    def test_forward_matches_xla(self):
        args = make_inputs()
        got = wn_stack_train(*args, interpret=True)
        want = xla_wn_stack(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("seed,shape", [(0, (2, 24, 8, 3)), (1, (1, 16, 16, 4))])
    def test_vjp_matches_autodiff(self, seed, shape):
        B, T, C, L = shape
        x, mask, cond, w_in, w_rs, b_rs, k = make_inputs(B, T, C, L, seed=seed)
        key = jax.random.PRNGKey(seed)
        # scalar loss with a random projection so every output element matters
        proj = jax.random.normal(key, (B, T, C))

        def loss_pallas(x, cond, w_in, w_rs, b_rs):
            out = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                                 interpret=True)
            return jnp.sum(out * proj)

        def loss_xla(x, cond, w_in, w_rs, b_rs):
            return jnp.sum(xla_wn_stack(x, mask, cond, w_in, w_rs, b_rs, k) * proj)

        g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(
            x, cond, w_in, w_rs, b_rs
        )
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
            x, cond, w_in, w_rs, b_rs
        )
        names = ["dx", "dcond", "dw_in", "dw_rs", "db_rs"]
        for name, a, b in zip(names, g_pallas, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=name,
            )

    def test_wn_stack_train_bf16_grads(self):
        """bf16 inputs (the reduced-precision policy): the kernel upcasts to
        f32 at the pallas_call boundary, so its output/grads must match the
        f32 run to bf16 CAST error only — i.e. the kernel under bf16 is at
        least as accurate as the XLA bf16 loop it replaces (VERDICT r4 #1:
        the old f32-only gate silently dropped the fused path under bf16)."""
        x, mask, cond, w_in, w_rs, b_rs, k = make_inputs()
        proj = jax.random.normal(jax.random.PRNGKey(7), x.shape)

        def loss(x, cond, w_in, w_rs, b_rs):
            out = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                                 interpret=True)
            return jnp.sum(out.astype(jnp.float32) * proj)

        args32 = (x, cond, w_in, w_rs, b_rs)
        args16 = tuple(a.astype(jnp.bfloat16) for a in args32)

        out16 = wn_stack_train(args16[0], mask, *args16[1:], k, interpret=True)
        assert out16.dtype == jnp.bfloat16
        out32 = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                               interpret=True)
        # forward: only input-cast + output-cast error (kernel math is f32)
        np.testing.assert_allclose(
            np.asarray(out16, np.float32), np.asarray(out32),
            rtol=0.05, atol=0.05,
        )

        g16 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args16)
        g32 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args32)
        names = ["dx", "dcond", "dw_in", "dw_rs", "db_rs"]
        for name, a, b in zip(names, g16, g32):
            assert a.dtype == jnp.bfloat16, name  # cotangents match inputs
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a, np.float32) / scale, np.asarray(b) / scale,
                rtol=0.1, atol=0.05, err_msg=name,
            )

    def test_bf16_compute_grads(self):
        """bf16_compute=True (the reduced-precision fast path: bf16 matmul
        operands, f32 accumulators/carries) — forward and every gradient
        must match the f32 kernel to bf16 rounding."""
        x, mask, cond, w_in, w_rs, b_rs, k = make_inputs()
        proj = jax.random.normal(jax.random.PRNGKey(9), x.shape)

        def loss(bf16c, x, cond, w_in, w_rs, b_rs):
            out = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                                 True, bf16c)  # interpret, bf16_compute
            return jnp.sum(out * proj)

        import functools

        g16 = jax.grad(functools.partial(loss, True),
                       argnums=(0, 1, 2, 3, 4))(x, cond, w_in, w_rs, b_rs)
        g32 = jax.grad(functools.partial(loss, False),
                       argnums=(0, 1, 2, 3, 4))(x, cond, w_in, w_rs, b_rs)
        out16 = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k, True, True)
        out32 = wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k, True, False)
        np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                                   rtol=0.05, atol=0.05)
        for name, a, b in zip(["dx", "dcond", "dw_in", "dw_rs", "db_rs"],
                              g16, g32):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=0.1, atol=0.05, err_msg=name)

    def test_vjp_last_layer_skip_grad_zero(self):
        """The dead [:, C:] half of the last layer's res_skip weights must
        receive exactly zero gradient (they don't affect the output)."""
        x, mask, cond, w_in, w_rs, b_rs, k = make_inputs()
        L, C = w_in.shape[0], x.shape[-1]

        def loss(w_rs):
            return jnp.sum(
                wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                               interpret=True) ** 2
            )

        g = jax.grad(loss)(w_rs)
        np.testing.assert_allclose(np.asarray(g[L - 1, :, C:]), 0.0, atol=1e-6)

    def test_padding_time_not_multiple_of_8(self):
        """T padding path: grads must not leak into the padded region."""
        x, mask, cond, w_in, w_rs, b_rs, k = make_inputs(T=21)

        def loss_pallas(x):
            return jnp.sum(
                wn_stack_train(x, mask, cond, w_in, w_rs, b_rs, k,
                               interpret=True) ** 2
            )

        def loss_xla(x):
            return jnp.sum(xla_wn_stack(x, mask, cond, w_in, w_rs, b_rs, k) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_pallas)(x)),
            np.asarray(jax.grad(loss_xla)(x)),
            rtol=2e-4, atol=2e-4,
        )
