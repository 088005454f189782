"""Trainable flash attention (custom VJP) vs jax.grad of the XLA path.

The kernel (ops/pallas/flash_attention_train.py) replaces the XLA
formulation for the FramePriorNet's training-mode attention — the measured
top stage of the GAN step.  These tests pin, in interpret mode on CPU:

* forward equality with the XLA reference (dropout off),
* gradient equality for every differentiable input (q, k, v, rel tables)
  against ``jax.grad`` of the XLA reference,
* forward determinism + fwd/bwd dropout-mask consistency (the backward
  regenerates the identical in-kernel PRNG mask; out is linear in V, so a
  same-seed directional difference in V must equal the VJP exactly).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pallas_kernels import xla_reference
from vispeech_tpu.ops.pallas.flash_attention_train import (
    relative_self_attention_train,
)


def make_inputs(B=2, H=2, T=200, d=64, w=4, n_rel=1, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
    rel_k = jnp.asarray(rng.randn(n_rel, 2 * w + 1, d) * d ** -0.5, jnp.float32)
    rel_v = jnp.asarray(rng.randn(n_rel, 2 * w + 1, d) * d ** -0.5, jnp.float32)
    lengths = [T, max(T - 37, 1)][:B] + [T] * max(B - 2, 0)
    mask = jnp.asarray(
        (np.arange(T)[None, :] < np.array(lengths)[:, None]), jnp.float32
    )
    return q, k, v, rel_k, rel_v, mask, lengths


class TestForward:
    @pytest.mark.parametrize("T,n_rel", [(128, 1), (200, 1), (128, 2)])
    def test_matches_xla(self, T, n_rel):
        q, k, v, rel_k, rel_v, mask, lengths = make_inputs(T=T, n_rel=n_rel)
        ref = xla_reference(q, k, v, rel_k, rel_v, mask, 4)
        out = relative_self_attention_train(
            q, k, v, rel_k, rel_v, mask, jnp.float32(0), 0.0,
            window=4, block_q=128, interpret=True,
        )
        for b, L in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(out[b, :, :L]), np.asarray(ref[b, :, :L]),
                rtol=2e-4, atol=2e-5,
            )


class TestGradients:
    @pytest.mark.parametrize("T,n_rel", [(128, 1), (200, 1), (128, 2)])
    def test_grads_match_xla(self, T, n_rel):
        q, k, v, rel_k, rel_v, mask, lengths = make_inputs(T=T, n_rel=n_rel)
        # a fixed masked projection makes the scalar loss sensitive
        # everywhere valid, and ignores padded query rows (as the encoder
        # does via x * x_mask)
        rng = np.random.RandomState(7)
        wgt = jnp.asarray(rng.randn(*q.shape), jnp.float32) * mask[:, None, :, None]

        def loss_kernel(q, k, v, rk, rv):
            out = relative_self_attention_train(
                q, k, v, rk, rv, mask, jnp.float32(0), 0.0,
                window=4, block_q=128, interpret=True,
            )
            return jnp.sum(out * wgt)

        def loss_xla(q, k, v, rk, rv):
            return jnp.sum(xla_reference(q, k, v, rk, rv, mask, 4) * wgt)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
        names = ("dq", "dk", "dv", "drel_k", "drel_v")
        for name, a, b in zip(names, gk, gx):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-4, atol=5e-5, err_msg=name,
            )

    def test_bf16_compute_grads(self):
        """bf16_compute=True (bf16 matmul operands, f32 softmax/accum — the
        reduced-precision fast path): forward and grads match the f32
        kernel to bf16 rounding."""
        q, k, v, rel_k, rel_v, mask, lengths = make_inputs(T=128)
        rng = np.random.RandomState(7)
        wgt = jnp.asarray(rng.randn(*q.shape), jnp.float32) * mask[:, None, :, None]

        def loss(bf16c, q, k, v, rk, rv):
            out = relative_self_attention_train(
                q, k, v, rk, rv, mask, jnp.float32(0), 0.0,
                window=4, block_q=128, interpret=True, bf16_compute=bf16c,
            )
            return jnp.sum(out * wgt)

        import functools

        out16 = relative_self_attention_train(
            q, k, v, rel_k, rel_v, mask, jnp.float32(0), 0.0,
            window=4, block_q=128, interpret=True, bf16_compute=True)
        out32 = relative_self_attention_train(
            q, k, v, rel_k, rel_v, mask, jnp.float32(0), 0.0,
            window=4, block_q=128, interpret=True, bf16_compute=False)
        np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                                   rtol=0.05, atol=0.05)
        g16 = jax.grad(functools.partial(loss, True),
                       argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
        g32 = jax.grad(functools.partial(loss, False),
                       argnums=(0, 1, 2, 3, 4))(q, k, v, rel_k, rel_v)
        for name, a, b in zip(("dq", "dk", "dv", "drel_k", "drel_v"),
                              g16, g32):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=0.1, atol=0.05, err_msg=name)

    def test_padded_key_columns_get_zero_grad(self):
        """dk/dv at masked key positions must be ~0 (p≈0 there)."""
        q, k, v, rel_k, rel_v, mask, lengths = make_inputs(T=128)

        def loss(k, v):
            out = relative_self_attention_train(
                q, k, v, rel_k, rel_v, mask, jnp.float32(0), 0.0,
                window=4, block_q=128, interpret=True,
            )
            return jnp.sum(out * mask[:, None, :, None])

        dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
        L = lengths[1]
        assert float(jnp.max(jnp.abs(dk[1, :, L:]))) < 1e-6
        assert float(jnp.max(jnp.abs(dv[1, :, L:]))) < 1e-6


class TestDropout:
    """rate>0 exercises the in-kernel TPU PRNG, which the CPU interpreter
    cannot emulate (``prng_seed`` has no CPU lowering) — those cases run on
    real TPU only; the rate==0 path (no PRNG call traced) stays CPU-tested."""

    RATE = 0.4

    def run(self, v, seed):
        q, k, _, rel_k, rel_v, mask, _ = make_inputs(T=128, seed=3)
        return relative_self_attention_train(
            q, k, v, rel_k, rel_v, mask, seed, self.RATE,
            window=4, block_q=128,
            interpret=jax.default_backend() != "tpu",
        )

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="in-kernel PRNG has no CPU interpreter lowering",
    )
    def test_deterministic_given_seed(self):
        _, _, v, _, _, _, _ = make_inputs(T=128, seed=3)
        a = self.run(v, jnp.float32(11))
        b = self.run(v, jnp.float32(11))
        c = self.run(v, jnp.float32(12))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.max(jnp.abs(a - c))) > 0  # seed actually matters

    def test_rate_zero_equals_no_dropout(self):
        q, k, v, rel_k, rel_v, mask, _ = make_inputs(T=128, seed=3)
        a = relative_self_attention_train(
            q, k, v, rel_k, rel_v, mask, jnp.float32(5), 0.0,
            window=4, block_q=128, interpret=True)
        b = xla_reference(q, k, v, rel_k, rel_v, mask, 4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="in-kernel PRNG has no CPU interpreter lowering",
    )
    def test_bwd_regenerates_same_mask(self):
        """out is LINEAR in v for a fixed dropout mask, so the VJP wrt v
        contracted with a direction must equal the same-seed forward
        difference exactly — only true if bwd rebuilds the identical mask."""
        _, _, v, _, _, _, _ = make_inputs(T=128, seed=3)
        seed = jnp.float32(21)
        rng = np.random.RandomState(9)
        dv_dir = jnp.asarray(rng.randn(*v.shape), jnp.float32)

        out0 = self.run(v, seed)
        out1 = self.run(v + dv_dir, seed)
        lin_diff = out1 - out0  # = pd · dv_dir (exact: linear in v)

        cot = jnp.asarray(rng.randn(*out0.shape), jnp.float32)
        _, vjp_fn = jax.vjp(lambda vv: self.run(vv, seed), v)
        (dv,) = vjp_fn(cot)
        # <cot, pd·dv_dir> == <dv, dv_dir>  (adjoint identity)
        lhs = float(jnp.sum(cot * lin_diff))
        rhs = float(jnp.sum(dv * dv_dir))
        assert abs(lhs - rhs) <= 2e-2 * max(abs(lhs), 1.0), (lhs, rhs)
