"""Conformer stack tests (reference frame_prior_network.py:127-602)."""

import jax
import jax.numpy as jnp
import numpy as np

from vispeech_tpu.models.conformer import (
    ConformerEncoder,
    RelativeMultiHeadAttention,
    sinusoidal_positions,
)
from vispeech_tpu.ops.masking import length_mask


class TestRelativeShift:
    def test_shift_semantics(self):
        """_relative_shift must match the torch pad-reshape trick: the
        diagonal of the shifted score picks pos index T−1−0 shifts per row."""
        b, h, t = 1, 1, 5
        x = jnp.arange(t * t, dtype=jnp.float32).reshape(1, 1, t, t)
        out = RelativeMultiHeadAttention._relative_shift(x)
        assert out.shape == (b, h, t, t)
        ref = np.zeros((t, t), np.float32)
        xin = np.arange(t * t, dtype=np.float32).reshape(t, t)
        # torch: pad left, view (t2+1, t1), drop first row → row i shifts by i
        padded = np.concatenate([np.zeros((t, 1), np.float32), xin], axis=1)
        padded = padded.reshape(t + 1, t)
        ref = padded[1:].reshape(t, t)
        np.testing.assert_allclose(np.asarray(out[0, 0]), ref)


class TestConformer:
    def test_forward_shapes_and_mask(self):
        B, T, D = 2, 64, 32
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
        mask = length_mask(jnp.asarray([64, 40]), T, jnp.float32)
        enc = ConformerEncoder(encoder_dim=D, n_layers=2, n_heads=4,
                               conv_kernel_size=7)
        variables = enc.init(jax.random.PRNGKey(0), x, mask)
        out = enc.apply(variables, x, mask, deterministic=True)
        assert out.shape == (B, T, D)
        assert np.isfinite(np.asarray(out)).all()
        # padded region stays zero
        np.testing.assert_allclose(np.asarray(out[1, 40:]), 0.0)

    def test_train_mode_batch_stats(self):
        B, T, D = 2, 32, 16
        x = jnp.asarray(np.random.RandomState(1).randn(B, T, D), jnp.float32)
        enc = ConformerEncoder(encoder_dim=D, n_layers=1, n_heads=2,
                               conv_kernel_size=7)
        variables = enc.init(jax.random.PRNGKey(0), x)
        out, updates = enc.apply(
            variables, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out.shape == (B, T, D)
        assert "batch_stats" in updates

    def test_positional_encoding(self):
        pe = sinusoidal_positions(10, 8)
        assert pe.shape == (1, 10, 8)
        np.testing.assert_allclose(np.asarray(pe[0, 0, 0::2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(pe[0, 0, 1::2]), 1.0, atol=1e-7)
