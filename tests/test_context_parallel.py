"""Context-parallelism tests on the virtual 8-device CPU mesh: ring attention
and the time-sharded overlap-save vocoder must match their single-device
computations exactly (SURVEY.md §5 long-context mandate)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vispeech_tpu.parallel.context import (
    make_generator_context_parallel,
    make_ring_attention,
)
from tests.test_pallas_kernels import xla_reference

# the parallelism tests exercise an 8-way virtual CPU mesh (conftest); the
# single-chip TPU tier cannot host them — multi-chip coverage stays on the
# CPU tier + the driver's dryrun_multichip
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")



def context_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("context",))


class TestRingAttention:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_dense(self, n_dev):
        B, H, T, d, w = 2, 2, 256, 32, 4
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        q, k, v = mk(B, H, T, d), mk(B, H, T, d), mk(B, H, T, d)
        rel_k = mk(1, 2 * w + 1, d) * d ** -0.5
        rel_v = mk(1, 2 * w + 1, d) * d ** -0.5
        lengths = [T, T - 50]
        mask = jnp.asarray(
            (np.arange(T)[None, :] < np.array(lengths)[:, None]), jnp.float32
        )

        ref = xla_reference(q, k, v, rel_k, rel_v, mask, w)
        mesh = context_mesh(n_dev)
        ring = make_ring_attention(mesh, window=w)
        out = jax.jit(ring)(q, k, v, rel_k[0], rel_v[0], mask)
        for b, L in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(out[b, :, :L]), np.asarray(ref[b, :, :L]),
                rtol=2e-4, atol=2e-5,
            )

    def test_long_sequence_memory_shape(self):
        """1408-frame config sharded 8 ways: runs and returns full shape."""
        B, H, T, d = 1, 2, 1408, 96
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        rel = jnp.zeros((9, d), jnp.float32)
        mask = jnp.ones((B, T), jnp.float32)
        mesh = context_mesh(8)
        ring = make_ring_attention(mesh, window=4)
        out = jax.jit(ring)(q, q, q, rel, rel, mask)
        assert out.shape == (B, H, T, d)
        assert np.isfinite(np.asarray(out)).all()


class TestContextParallelVocoder:
    def test_matches_full_generator(self):
        from vispeech_tpu.models.generator import Generator

        hop = 64
        gen = Generator(
            resblock="1",
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
            upsample_rates=(4, 4, 2, 2),
            upsample_initial_channel=64,
            upsample_kernel_sizes=(8, 8, 4, 4),
            gin_channels=16,
        )
        B, T, C = 1, 256, 32
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        g = jnp.asarray(rng.randn(B, 1, 16), jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), z, g)

        full = gen.apply(params, z, g)

        mesh = context_mesh(4)
        cp = make_generator_context_parallel(
            lambda z_l, g_l: gen.apply(params, z_l, g_l),
            mesh, hop_length=hop, halo=32,
        )
        out = jax.jit(cp)(z, g)
        assert out.shape == full.shape
        # exact everywhere except the outermost global-edge samples
        # (explicit zero halo vs per-layer conv padding; <0.2 ms of audio)
        edge = 16
        np.testing.assert_allclose(
            np.asarray(out[:, edge:-edge]), np.asarray(full[:, edge:-edge]),
            rtol=1e-4, atol=1e-4,
        )
        bad = np.flatnonzero(~np.isclose(
            np.asarray(out[0, :, 0]), np.asarray(full[0, :, 0]),
            rtol=1e-4, atol=1e-4,
        ))
        assert bad.size <= 2 * edge
        assert np.isfinite(np.asarray(out)).all()
