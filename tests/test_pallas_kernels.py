"""Pallas kernels vs XLA references (interpret mode on CPU, SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.ops.attention import (
    _pad_rel_embeddings,
    _relative_to_absolute,
    _absolute_to_relative,
)
from vispeech_tpu.ops.pallas.flash_attention import relative_self_attention


def xla_reference(q, k, v, rel_k, rel_v, key_mask, window):
    """The ops/attention.py formulation on pre-projected heads."""
    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k,
                        precision=jax.lax.Precision.HIGHEST)
    rk = jax.vmap(lambda r: _pad_rel_embeddings(r, T, window))(rel_k)
    rel_logits = jnp.einsum("bhtd,hmd->bhtm", q * scale, rk,
                            precision=jax.lax.Precision.HIGHEST)
    scores = scores + _relative_to_absolute(rel_logits)
    attn_mask = key_mask[:, None, None, :]
    scores = jnp.where(attn_mask == 0, -1e4, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v,
                     precision=jax.lax.Precision.HIGHEST)
    rel_w = _absolute_to_relative(p)
    rv = jax.vmap(lambda r: _pad_rel_embeddings(r, T, window))(rel_v)
    out = out + jnp.einsum("bhtm,hmd->bhtd", rel_w, rv,
                           precision=jax.lax.Precision.HIGHEST)
    return out


class TestRelativeSelfAttention:
    @pytest.mark.parametrize("T,block_q", [(128, 128), (256, 128), (200, 128)])
    def test_matches_xla(self, T, block_q):
        B, H, d, w = 2, 2, 96, 4
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        k = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        v = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        rel_k = jnp.asarray(rng.randn(1, 2 * w + 1, d) * d ** -0.5, jnp.float32)
        rel_v = jnp.asarray(rng.randn(1, 2 * w + 1, d) * d ** -0.5, jnp.float32)
        lengths = [T, max(T - 37, 1)]
        mask = jnp.asarray(
            (np.arange(T)[None, :] < np.array(lengths)[:, None]), jnp.float32
        )

        ref = xla_reference(q, k, v, rel_k, rel_v, mask, w)
        out = relative_self_attention(
            q, k, v, rel_k, rel_v, mask, window=w, block_q=block_q,
            interpret=True,
        )
        # compare only valid query rows (padded queries are masked downstream)
        for b, L in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(out[b, :, :L]), np.asarray(ref[b, :, :L]),
                rtol=2e-4, atol=2e-5,
            )

    def test_per_head_rel_tables(self):
        B, H, T, d, w = 1, 2, 128, 64, 4
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        k = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        v = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        rel_k = jnp.asarray(rng.randn(H, 2 * w + 1, d) * d ** -0.5, jnp.float32)
        rel_v = jnp.asarray(rng.randn(H, 2 * w + 1, d) * d ** -0.5, jnp.float32)
        mask = jnp.ones((B, T), jnp.float32)
        ref = xla_reference(q, k, v, rel_k, rel_v, mask, w)
        out = relative_self_attention(
            q, k, v, rel_k, rel_v, mask, window=w, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_encoder_pallas_matches_xla(self):
        """Full Encoder stack: fused kernel path ≡ XLA path on same params."""
        from vispeech_tpu.ops.attention import Encoder
        from vispeech_tpu.ops.masking import length_mask

        B, T, C = 2, 150, 64
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        lengths = jnp.asarray([150, 97], jnp.int32)
        x_mask = length_mask(lengths, T, jnp.float32)

        enc_xla = Encoder(C, 128, n_heads=2, n_layers=2, kernel_size=3,
                          use_pallas=False)
        enc_pl = Encoder(C, 128, n_heads=2, n_layers=2, kernel_size=3,
                         use_pallas=True)
        params = enc_xla.init(jax.random.PRNGKey(0), x, x_mask)
        ref = enc_xla.apply(params, x, x_mask, deterministic=True)
        out = enc_pl.apply(params, x, x_mask, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5)

    def test_fully_masked_rows_finite(self):
        B, H, T, d = 1, 1, 128, 64
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(B, H, T, d), jnp.float32)
        rel = jnp.zeros((1, 9, d), jnp.float32)
        mask = jnp.zeros((B, T), jnp.float32).at[:, :5].set(1.0)
        out = relative_self_attention(
            q, q, q, rel, rel, mask, window=4, interpret=True
        )
        assert np.isfinite(np.asarray(out)).all()


class TestWNStack:
    """Fused WN kernel ≡ the XLA layer loop on identical parameters."""

    def make_wn(self, use_pallas, L=4, C=32, gin=16):
        from vispeech_tpu.ops.wavenet import WN

        return WN(hidden_channels=C, kernel_size=5, dilation_rate=1,
                  n_layers=L, gin_channels=gin, use_pallas=use_pallas)

    @pytest.mark.parametrize("with_g", [True, False])
    def test_matches_xla(self, with_g):
        from vispeech_tpu.ops.masking import length_mask

        B, T, C, gin = 2, 100, 32, 16
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        g = jnp.asarray(rng.randn(B, 1, gin), jnp.float32) if with_g else None
        mask = length_mask(jnp.asarray([100, 63]), T, jnp.float32)

        wn_xla = self.make_wn(False, C=C, gin=gin)
        wn_pl = self.make_wn(True, C=C, gin=gin)
        params = wn_xla.init(jax.random.PRNGKey(0), x, mask, g=g)
        ref = wn_xla.apply(params, x, mask, g=g)
        out = wn_pl.apply(params, x, mask, g=g)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 16, 32))
        mask = jnp.ones((1, 16, 1))
        g = jnp.zeros((1, 1, 16))
        p_xla = self.make_wn(False).init(jax.random.PRNGKey(0), x, mask, g=g)
        p_pl = self.make_wn(True).init(jax.random.PRNGKey(0), x, mask, g=g)
        assert jax.tree_util.tree_structure(p_xla) == jax.tree_util.tree_structure(p_pl)
        for a, b in zip(jax.tree_util.tree_leaves(p_xla),
                        jax.tree_util.tree_leaves(p_pl)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_posterior_encoder_16_layers(self):
        """The enc_q configuration: 16 layers, k5, matches XLA."""
        from vispeech_tpu.ops.masking import length_mask

        B, T, C = 1, 64, 24
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(B, T, C), jnp.float32)
        mask = length_mask(jnp.asarray([50]), T, jnp.float32)
        wn_xla = self.make_wn(False, L=16, C=C, gin=8)
        wn_pl = self.make_wn(True, L=16, C=C, gin=8)
        g = jnp.asarray(rng.randn(B, 1, 8), jnp.float32)
        params = wn_xla.init(jax.random.PRNGKey(0), x, mask, g=g)
        ref = wn_xla.apply(params, x, mask, g=g)
        out = wn_pl.apply(params, x, mask, g=g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5)


class TestMRFStage:
    """Fused MRF resblock stage vs the XLA ResBlock1 path
    (ops/pallas/mrf_stage.py; interpret mode on CPU)."""

    def _generator(self):
        from vispeech_tpu.models.generator import Generator

        return Generator(
            resblock="1",
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3,
            upsample_rates=(4, 2),
            upsample_initial_channel=64,
            upsample_kernel_sizes=(8, 4),
            gin_channels=8,
        )

    def test_generator_fused_matches_xla(self):
        gen = self._generator()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 40, 16), jnp.float32)
        g = jnp.asarray(rng.randn(2, 1, 8), jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), x, g)
        ref = gen.apply(params, x, g, fused=False)
        out = gen.apply(params, x, g, fused=True)
        assert out.shape == ref.shape == (2, 40 * 8, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_param_tree_identical(self):
        gen = self._generator()
        x = jnp.zeros((1, 8, 16))
        g = jnp.zeros((1, 1, 8))
        p1 = gen.init(jax.random.PRNGKey(0), x, g, fused=False)
        p2 = gen.init(jax.random.PRNGKey(0), x, g, fused=True)
        assert (jax.tree_util.tree_structure(p1)
                == jax.tree_util.tree_structure(p2))
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mrf_stack_direct_long_tile_boundary(self):
        """T crossing several tiles (tile=128 forced) stays exact."""
        from vispeech_tpu.ops.pallas.mrf_stage import mrf_stack
        from vispeech_tpu.ops.resblock import ResBlock1

        C = 16
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 300, C), jnp.float32)
        blocks = [ResBlock1(C, k, (1, 3, 5)) for k in (3, 7, 11)]
        params, packed, refs = [], [], []
        for i, b in enumerate(blocks):
            p = b.init(jax.random.PRNGKey(i), x)
            params.append(p)
            packed.append(b.apply(p, x, collect=True))
            refs.append(b.apply(p, x))
        ref = sum(refs) / 3
        out = mrf_stack(x, tuple(packed), kernel_sizes=(3, 7, 11),
                        dilations=((1, 3, 5),) * 3, tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestFoldedMRFPallasKernel:
    """VMEM-fused folded MRF (mrf_stack_folded) vs the XLA folded path —
    the measured-alternative kernel for the C<64 vocoder tail (kept for
    dispatch reproducibility; XLA currently wins on v5e)."""

    def test_matches_xla_folded_across_tiles(self):
        from vispeech_tpu.ops.folded_mrf import mrf_stage_folded
        from vispeech_tpu.ops.pallas.mrf_stage import mrf_stack_folded

        r = np.random.RandomState(0)
        # T=1024, fold=4 → Tf=256 with tile=128 gives nt=2, so the
        # left/right neighbor-block halo path is genuinely exercised
        B, T, C, fold = 2, 1024, 16, 4
        ks, dils = (3, 7, 11), ((1, 3, 5),) * 3
        x = jnp.asarray(r.randn(B, T, C).astype(np.float32))
        packed = tuple(
            tuple(
                jnp.asarray(a.astype(np.float32))
                for a in (r.randn(3, k, C, C) * 0.05, r.randn(3, 1, C) * 0.1,
                          r.randn(3, k, C, C) * 0.05, r.randn(3, 1, C) * 0.1)
            )
            for k in ks
        )
        ref = mrf_stage_folded(x, packed, ks, dils, fold)
        out = mrf_stack_folded(x, packed, ks, dils, fold=fold, tile=128,
                               interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=2e-5)


class TestFoldedMRF:
    """Polyphase channel-folded MRF stage vs the XLA ResBlock1 path
    (ops/folded_mrf.py — exact in float32, any backend)."""

    def _stage(self, C, T, fold, kernels=(3, 7, 11), dils=((1, 3, 5),) * 3,
               seed=0):
        from vispeech_tpu.ops.folded_mrf import mrf_stage_folded
        from vispeech_tpu.ops.resblock import ResBlock1

        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(2, T, C), jnp.float32)
        packed, refs = [], []
        for i, (k, d) in enumerate(zip(kernels, dils)):
            b = ResBlock1(C, k, tuple(d))
            p = b.init(jax.random.PRNGKey(i), x)
            packed.append(b.apply(p, x, collect=True))
            refs.append(b.apply(p, x))
        ref = sum(refs) / len(refs)
        out = mrf_stage_folded(x, tuple(packed), kernel_sizes=kernels,
                               dilations=dils, fold=fold)
        return np.asarray(out), np.asarray(ref)

    def test_fold4_matches_xla(self):
        out, ref = self._stage(C=32, T=128, fold=4)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_fold8_matches_xla(self):
        out, ref = self._stage(C=16, T=104, fold=8, seed=3)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_fold2_single_branch(self):
        out, ref = self._stage(C=8, T=30, fold=2, kernels=(5,),
                               dils=((1, 2),), seed=7)
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_fold_weights_roundtrip_identity_conv(self):
        """A k=1 identity conv folds to a block-diagonal identity."""
        from vispeech_tpu.ops.folded_mrf import fold_conv_weights

        C, fold = 4, 4
        w = jnp.eye(C)[None]  # [1, C, C]
        b = jnp.zeros((C,))
        wf, bf, (lo, hi) = fold_conv_weights(w, b, dilation=1, fold=fold)
        assert wf.shape == (1, fold * C, fold * C) and lo == hi == 0
        np.testing.assert_array_equal(np.asarray(wf[0]), np.eye(fold * C))

    def test_indivisible_t_raises(self):
        import pytest

        from vispeech_tpu.ops.folded_mrf import mrf_stage_folded

        with pytest.raises(ValueError):
            self._stage(C=8, T=31, fold=2, kernels=(3,), dils=((1,),))
