"""Core op tests: rel-pos attention vs naive numpy oracle, spline inversion,
flow invertibility + logdet, WN/DDSConv/resblock mask invariants, length
regulator properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.ops.attention import (
    Encoder,
    MultiHeadAttention,
    _absolute_to_relative,
    _pad_rel_embeddings,
    _relative_to_absolute,
)
from vispeech_tpu.ops.ddsconv import DDSConv
from vispeech_tpu.ops.flows import (
    ConvFlow,
    ElementwiseAffine,
    Flip,
    Log,
    ResidualCouplingLayer,
)
from vispeech_tpu.ops.length_regulator import length_regulate, length_regulate_gather
from vispeech_tpu.ops.masking import (
    length_mask,
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)
from vispeech_tpu.ops.resblock import ResBlock1, ResBlock2
from vispeech_tpu.ops.spline import unconstrained_rational_quadratic_spline
from vispeech_tpu.ops.wavenet import WN

KEY = jax.random.PRNGKey(0)


class TestSkewTricks:
    """The pad-reshape relative↔absolute shifts vs direct index arithmetic."""

    def test_relative_to_absolute(self):
        rng = np.random.RandomState(0)
        B, H, L = 2, 3, 7
        x = rng.randn(B, H, L, 2 * L - 1).astype(np.float32)
        got = np.asarray(_relative_to_absolute(jnp.asarray(x)))
        # direct: abs[t, s] = rel[t, s - t + L - 1]
        want = np.zeros((B, H, L, L), np.float32)
        for t in range(L):
            for s in range(L):
                want[:, :, t, s] = x[:, :, t, s - t + L - 1]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_absolute_to_relative_roundtrip(self):
        rng = np.random.RandomState(1)
        B, H, L = 1, 2, 5
        p = rng.randn(B, H, L, L).astype(np.float32)
        rel = np.asarray(_absolute_to_relative(jnp.asarray(p)))
        back = np.asarray(_relative_to_absolute(jnp.asarray(rel)))
        np.testing.assert_allclose(back, p, atol=1e-6)

    def test_pad_rel_embeddings(self):
        w, d = 4, 6
        rel = np.random.RandomState(2).randn(2 * w + 1, d).astype(np.float32)
        # L > w+1 → zero-pad to 2L−1
        L = 9
        got = np.asarray(_pad_rel_embeddings(jnp.asarray(rel), L, w))
        assert got.shape == (2 * L - 1, d)
        np.testing.assert_allclose(got[L - 1 - w : L + w], rel, atol=1e-6)
        assert (got[: L - 1 - w] == 0).all() and (got[L + w :] == 0).all()
        # L <= w+1 → slice the middle
        L = 3
        got = np.asarray(_pad_rel_embeddings(jnp.asarray(rel), L, w))
        assert got.shape == (2 * L - 1, d)
        np.testing.assert_allclose(got, rel[w + 1 - L : w + 1 - L + 2 * L - 1], atol=1e-6)


class TestMultiHeadAttention:
    def test_vs_numpy_oracle(self):
        """Full windowed rel-pos MHA against a direct O(T²) computation."""
        B, T, C, H, W = 2, 10, 8, 2, 4
        mod = MultiHeadAttention(C, C, H, window_size=W)
        x = jax.random.normal(jax.random.PRNGKey(3), (B, T, C))
        lengths = jnp.array([10, 7])
        mask = length_mask(lengths, T)
        m = np.asarray(mask[:, :, 0])
        attn_mask = jnp.asarray(m[:, None, :, None] * m[:, None, None, :])
        params = mod.init(KEY, x, x, attn_mask)
        got = np.asarray(mod.apply(params, x, x, attn_mask))

        p = jax.tree_util.tree_map(np.asarray, params["params"])
        dk = C // H

        def conv1x1(name, inp):
            w = p[name]["kernel"][0]  # [cin, cout]
            return inp @ w + p[name]["bias"]

        xn = np.asarray(x)
        q = conv1x1("conv_q", xn).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        k = conv1x1("conv_k", xn).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        v = conv1x1("conv_v", xn).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
        rel_k, rel_v = p["emb_rel_k"][0], p["emb_rel_v"][0]  # heads shared

        def rel_table(tbl, d):
            return tbl[d + W] if abs(d) <= W else np.zeros(dk, np.float32)

        out = np.zeros((B, H, T, dk), np.float32)
        for b in range(B):
            for h in range(H):
                scores = np.zeros((T, T), np.float32)
                for t in range(T):
                    for s in range(T):
                        sc = q[b, h, t] @ k[b, h, s] / np.sqrt(dk)
                        sc += q[b, h, t] @ rel_table(rel_k, s - t) / np.sqrt(dk)
                        if not (m[b, t] and m[b, s]):
                            sc = -1e4
                        scores[t, s] = sc
                pa = np.exp(scores - scores.max(-1, keepdims=True))
                pa /= pa.sum(-1, keepdims=True)
                for t in range(T):
                    acc = pa[t] @ v[b, h]
                    for s in range(T):
                        acc = acc + pa[t, s] * rel_table(rel_v, s - t)
                    out[b, h, t] = acc
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        want = conv1x1("conv_o", out)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_encoder_mask_invariance(self):
        """Padding content must not affect valid positions."""
        B, T, C = 2, 12, 16
        enc = Encoder(C, 32, 2, 2, kernel_size=3, p_dropout=0.0)
        lengths = jnp.array([12, 8])
        mask = length_mask(lengths, T)
        x = jax.random.normal(jax.random.PRNGKey(4), (B, T, C))
        params = enc.init(KEY, x, mask)
        y1 = enc.apply(params, x * mask, mask)
        noise = jax.random.normal(jax.random.PRNGKey(5), (B, T, C)) * (1 - mask)
        y2 = enc.apply(params, x * mask + noise, mask)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        # padded outputs are zero
        assert np.abs(np.asarray(y1) * (1 - np.asarray(mask))).max() == 0


class TestSpline:
    def test_forward_inverse_identity(self):
        rng = jax.random.PRNGKey(6)
        shape = (4, 9)
        K = 10
        uw = jax.random.normal(jax.random.fold_in(rng, 0), (*shape, K))
        uh = jax.random.normal(jax.random.fold_in(rng, 1), (*shape, K))
        ud = jax.random.normal(jax.random.fold_in(rng, 2), (*shape, K - 1))
        x = jax.random.normal(jax.random.fold_in(rng, 3), shape) * 3.0
        y, ld = unconstrained_rational_quadratic_spline(x, uw, uh, ud, tail_bound=5.0)
        x2, ld_inv = unconstrained_rational_quadratic_spline(
            y, uw, uh, ud, inverse=True, tail_bound=5.0
        )
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)

    def test_logdet_matches_autodiff(self):
        K = 10
        rng = jax.random.PRNGKey(7)
        uw = jax.random.normal(jax.random.fold_in(rng, 0), (K,))
        uh = jax.random.normal(jax.random.fold_in(rng, 1), (K,))
        ud = jax.random.normal(jax.random.fold_in(rng, 2), (K - 1,))

        def f(x):
            y, _ = unconstrained_rational_quadratic_spline(
                x[None], uw[None], uh[None], ud[None], tail_bound=5.0
            )
            return y[0]

        for xv in [-4.0, -1.0, 0.3, 2.5, 4.9]:
            dydx = jax.grad(f)(jnp.float32(xv))
            _, ld = unconstrained_rational_quadratic_spline(
                jnp.array([xv]), uw[None], uh[None], ud[None], tail_bound=5.0
            )
            np.testing.assert_allclose(float(ld[0]), float(jnp.log(dydx)), rtol=1e-3)

    def test_identity_outside_tails(self):
        K = 10
        z = jnp.zeros((3, K))
        x = jnp.array([-7.0, 6.0, 100.0])
        y, ld = unconstrained_rational_quadratic_spline(x, z, z, z[:, :-1], tail_bound=5.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))
        np.testing.assert_allclose(np.asarray(ld), 0.0)


class TestFlows:
    def _mask(self, B, T):
        return jnp.ones((B, T, 1))

    def test_elementwise_affine_inverse(self):
        B, T, C = 2, 6, 4
        mod = ElementwiseAffine(C)
        x = jax.random.normal(KEY, (B, T, C))
        mask = self._mask(B, T)
        params = mod.init(KEY, x, mask)
        params = jax.tree_util.tree_map(
            lambda a: jax.random.normal(jax.random.PRNGKey(8), a.shape) * 0.3, params
        )
        y, ld = mod.apply(params, x, mask)
        x2 = mod.apply(params, y, mask, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    def test_log_flow_inverse(self):
        mod = Log()
        x = jnp.abs(jax.random.normal(KEY, (2, 5, 3))) + 0.1
        mask = self._mask(2, 5)
        params = mod.init(KEY, x, mask)
        y, ld = mod.apply(params, x, mask)
        x2 = mod.apply(params, y, mask, reverse=True)
        # fp32 log∘exp round-trip noise ~5e-5
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4)

    def test_coupling_inverse(self):
        B, T, C = 2, 8, 6
        mod = ResidualCouplingLayer(C, 16, 5, 1, 2, mean_only=True)
        x = jax.random.normal(KEY, (B, T, C))
        mask = self._mask(B, T)
        params = mod.init(KEY, x, mask)
        # randomize the zero-initialized post conv so the flow is nontrivial
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(9), a.shape),
            params,
        )
        y, ld = mod.apply(params, x, mask)
        x2 = mod.apply(params, y, mask, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-5)
        # mean-only coupling: logdet must be 0
        np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)

    def test_convflow_inverse(self):
        B, T, C = 2, 8, 2
        mod = ConvFlow(C, 16, 3, n_layers=2)
        x = jax.random.normal(KEY, (B, T, C))
        mask = self._mask(B, T)
        params = mod.init(KEY, x, mask)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(10), a.shape),
            params,
        )
        y, ld = mod.apply(params, x, mask)
        x2 = mod.apply(params, y, mask, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-4)

    def test_flip(self):
        mod = Flip()
        x = jax.random.normal(KEY, (2, 4, 6))
        params = mod.init(KEY, x)
        y, ld = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(ld), 0.0)
        x2 = mod.apply(params, y, reverse=True)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x))


class TestWNAndBlocks:
    def test_wn_mask_and_cond(self):
        B, T, C, G = 2, 10, 8, 6
        mod = WN(C, 5, 1, 3, gin_channels=G)
        x = jax.random.normal(KEY, (B, T, C))
        g = jax.random.normal(jax.random.PRNGKey(11), (B, 1, G))
        mask = length_mask(jnp.array([10, 6]), T)
        params = mod.init(KEY, x, mask, g)
        y = mod.apply(params, x * mask, mask, g)
        assert np.abs(np.asarray(y) * (1 - np.asarray(mask))).max() == 0
        # conditioning changes the output
        y2 = mod.apply(params, x * mask, mask, g * 2)
        assert not np.allclose(np.asarray(y), np.asarray(y2))

    def test_ddsconv_shapes(self):
        mod = DDSConv(8, 3, 3)
        x = jax.random.normal(KEY, (2, 12, 8))
        mask = jnp.ones((2, 12, 1))
        params = mod.init(KEY, x, mask)
        y = mod.apply(params, x, mask)
        assert y.shape == x.shape

    @pytest.mark.parametrize("cls", [ResBlock1, ResBlock2])
    def test_resblocks(self, cls):
        mod = cls(8, 3)
        x = jax.random.normal(KEY, (2, 16, 8))
        params = mod.init(KEY, x)
        y = mod.apply(params, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


class TestLengthRegulator:
    def test_matches_numpy_repeat(self):
        rng = np.random.RandomState(3)
        B, N, C = 3, 7, 5
        x = rng.randn(B, N, C).astype(np.float32)
        dur = rng.randint(0, 4, size=(B, N))
        T = int(dur.sum(1).max())
        frames, flen = length_regulate(jnp.asarray(x), jnp.asarray(dur), T)
        assert list(np.asarray(flen)) == list(dur.sum(1))
        for b in range(B):
            want = np.repeat(x[b], dur[b], axis=0)
            got = np.asarray(frames[b])[: dur[b].sum()]
            np.testing.assert_allclose(got, want, atol=1e-6)
            # padding is zero
            assert np.abs(np.asarray(frames[b])[dur[b].sum():]).max() == 0 if dur[b].sum() < T else True

    def test_gather_variant_equivalent(self):
        rng = np.random.RandomState(4)
        B, N, C = 2, 9, 4
        x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        dur = jnp.asarray(rng.randint(0, 5, size=(B, N)))
        T = 40
        f1, l1 = length_regulate(x, dur, T)
        f2, l2 = length_regulate_gather(x, dur, T)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))

    def test_negative_durations_clamped(self):
        x = jnp.ones((1, 3, 2))
        dur = jnp.array([[-2, 3, 1]])
        frames, flen = length_regulate(x, dur, 6)
        assert int(flen[0]) == 4

    def test_differentiable(self):
        x = jnp.ones((1, 3, 2))
        dur = jnp.array([[1, 2, 1]])

        def loss(x):
            f, _ = length_regulate(x, dur, 4)
            return jnp.sum(f ** 2)

        g = jax.grad(loss)(x)
        # each phoneme's grad scales with its duration
        np.testing.assert_allclose(np.asarray(g[0, :, 0]), [2.0, 4.0, 2.0])


class TestSlicing:
    def test_slice_segments(self):
        x = jnp.arange(2 * 10 * 3).reshape(2, 10, 3).astype(jnp.float32)
        out = slice_segments(x, jnp.array([0, 4]), 4)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(x[0, 0:4]))
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1, 4:8]))

    def test_rand_slice_in_bounds(self):
        x = jnp.ones((4, 20, 2))
        lengths = jnp.array([20, 12, 8, 15])
        for seed in range(5):
            _, ids = rand_slice_segments(x, lengths, 8, jax.random.PRNGKey(seed))
            ids = np.asarray(ids)
            assert (ids >= 0).all()
            assert (ids + 8 <= np.asarray(lengths)).all()

    def test_sequence_mask(self):
        m = sequence_mask(jnp.array([2, 5]), 6)
        assert m.shape == (2, 6)
        assert m.sum() == 7
