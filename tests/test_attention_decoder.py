"""Causal Decoder / FFT block tests (reference attentions.py:50-99, 303-349)."""

import jax
import jax.numpy as jnp
import numpy as np

from vispeech_tpu.ops.attention import FFT, Decoder
from vispeech_tpu.ops.masking import length_mask


class TestFFT:
    def test_causality(self):
        """Changing future inputs must not change past outputs."""
        B, T, C = 1, 16, 32
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        mask = jnp.ones((B, T, 1), jnp.float32)
        fft = FFT(C, 64, n_heads=2, n_layers=2, kernel_size=3)
        params = fft.init(jax.random.PRNGKey(0), x, mask)
        out1 = fft.apply(params, x, mask)
        x2 = x.at[:, 10:].set(rng.randn(B, 6, C))
        out2 = fft.apply(params, x2, mask)
        np.testing.assert_allclose(
            np.asarray(out1[:, :8]), np.asarray(out2[:, :8]), rtol=1e-5, atol=1e-6
        )
        assert not np.allclose(np.asarray(out1[:, 12:]), np.asarray(out2[:, 12:]))


class TestDecoder:
    def test_forward_and_masking(self):
        B, T_t, T_s, C = 2, 12, 20, 32
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(B, T_t, C), jnp.float32)
        h = jnp.asarray(rng.randn(B, T_s, C), jnp.float32)
        x_mask = length_mask(jnp.asarray([12, 7]), T_t, jnp.float32)
        h_mask = length_mask(jnp.asarray([20, 11]), T_s, jnp.float32)
        dec = Decoder(C, 64, n_heads=2, n_layers=2, kernel_size=3)
        params = dec.init(jax.random.PRNGKey(0), x, x_mask, h, h_mask)
        out = dec.apply(params, x, x_mask, h, h_mask)
        assert out.shape == (B, T_t, C)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out[1, 7:]), 0.0)

    def test_cross_attention_uses_encoder(self):
        B, T, C = 1, 8, 16
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        h1 = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        h2 = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        mask = jnp.ones((B, T, 1), jnp.float32)
        dec = Decoder(C, 32, n_heads=2, n_layers=1)
        params = dec.init(jax.random.PRNGKey(0), x, mask, h1, mask)
        o1 = dec.apply(params, x, mask, h1, mask)
        o2 = dec.apply(params, x, mask, h2, mask)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestF0Coarse:
    def test_quantizer(self):
        from vispeech_tpu.dsp.pitch import f0_to_coarse

        f0 = np.array([0.0, 50.0, 220.0, 1100.0, 2000.0])
        c = f0_to_coarse(f0)
        assert c[0] == 1          # unvoiced → bin 1
        assert c[1] == 1          # f0_min → bin 1
        assert c[3] == 255        # f0_max → top bin
        assert c[4] == 255        # clamped
        assert 1 < c[2] < 255
        assert c.dtype == np.int64
