"""End-to-end model tests on tiny shapes: training forward, inference with
prosody controls, voice conversion, discriminators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.models import MultiPeriodDiscriminator, Synthesizer

# tiny architecture for CPU-fast tests; upsample 4·2 = hop 8
TINY = dict(
    n_vocab=40,
    spec_channels=9,
    segment_size=8,
    inter_channels=8,
    hidden_channels=8,
    filter_channels=16,
    n_heads=2,
    n_layers=1,
    kernel_size=3,
    p_dropout=0.1,
    resblock="1",
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    upsample_rates=(4, 2),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 4),
    n_speakers=4,
    gin_channels=6,
)
HOP = 8
B, N, T = 2, 6, 16


def make_batch(rng=0):
    r = np.random.RandomState(rng)
    phonemes = r.randint(1, TINY["n_vocab"], size=(B, N))
    phoneme_lengths = np.array([N, N - 2])
    dur = r.randint(1, 4, size=(B, N))
    dur[1, -2:] = 0
    spec_lengths = dur.sum(1)
    T_max = T
    f0 = r.uniform(80, 400, size=(B, N)).astype(np.float32)
    energy = r.uniform(30, 90, size=(B, N)).astype(np.float32)
    spec = r.randn(B, T_max, TINY["spec_channels"]).astype(np.float32)
    sid = np.array([0, 2])
    return (
        jnp.asarray(phonemes), jnp.asarray(phoneme_lengths), jnp.asarray(f0),
        jnp.asarray(energy), jnp.asarray(dur), jnp.asarray(spec),
        jnp.asarray(spec_lengths), jnp.asarray(sid),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = Synthesizer(**TINY)
    batch = make_batch()
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    params = model.init(rngs, *batch, deterministic=True)
    return model, params


class TestTrainingForward:
    def test_shapes_and_losses(self, model_and_params):
        model, params = model_and_params
        batch = make_batch()
        out = model.apply(
            params, *batch, deterministic=True,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        (o, l_length, l_pitch, l_energy, ids_slice, x_mask, y_mask,
         latents, pred_f0, pred_ne, ne) = out
        assert o.shape == (B, TINY["segment_size"] * HOP, 1)
        for l in (l_length, l_pitch, l_energy):
            assert np.isfinite(float(l))
        z, z_p, m_p, logs_p, m_q, logs_q = latents
        assert z.shape == (B, T, TINY["inter_channels"])
        assert m_p.shape == z.shape
        assert pred_f0.shape == (B, N)

    def test_deterministic_with_fixed_rng(self, model_and_params):
        model, params = model_and_params
        batch = make_batch()
        r = {"sample": jax.random.PRNGKey(7)}
        o1 = model.apply(params, *batch, deterministic=True, rngs=r)[0]
        o2 = model.apply(params, *batch, deterministic=True, rngs=r)[0]
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


class TestInference:
    def test_basic_infer(self, model_and_params):
        model, params = model_and_params
        phonemes, lengths, *_ , sid = make_batch()
        o, mask, latents, dur, f0, energy = model.apply(
            params, phonemes, lengths, T, sid=sid, noise_scale=0.667,
            method=Synthesizer.infer, rngs={"sample": jax.random.PRNGKey(4)},
        )
        assert o.shape == (B, T * HOP, 1)
        assert dur.shape == (B, N)
        assert np.isfinite(np.asarray(o)).all()

    def test_duration_tensor_override(self, model_and_params):
        model, params = model_and_params
        phonemes, lengths, *_, sid = make_batch()
        dur = jnp.full((B, N), 2.0)
        o, mask, latents, out_dur, f0, energy = model.apply(
            params, phonemes, lengths, T, sid=sid, duration_control=dur,
            method=Synthesizer.infer, rngs={"sample": jax.random.PRNGKey(4)},
        )
        np.testing.assert_allclose(np.asarray(out_dur), np.asarray(dur))
        # realized frames = 12 per utt → masked to 12 frames
        assert float(mask[0].sum()) == 12

    def test_pitch_tensor_override_roundtrip(self, model_and_params):
        model, params = model_and_params
        phonemes, lengths, *_, sid = make_batch()
        pitch = jnp.full((B, N), 220.0)
        o, mask, latents, dur, f0, energy = model.apply(
            params, phonemes, lengths, T, sid=sid, pitch_control=pitch,
            method=Synthesizer.infer, rngs={"sample": jax.random.PRNGKey(4)},
        )
        # returned F0 passes through LF0→F0 with the reference's asymmetric
        # 2595/2590 constants → slightly above the requested Hz
        assert np.allclose(np.asarray(f0), 220.0, rtol=0.02)

    def test_scalar_controls_change_output(self, model_and_params):
        model, params = model_and_params
        phonemes, lengths, *_, sid = make_batch()
        kw = dict(method=Synthesizer.infer, rngs={"sample": jax.random.PRNGKey(4)})
        base = model.apply(params, phonemes, lengths, T, sid=sid, **kw)
        slow = model.apply(
            params, phonemes, lengths, T, sid=sid, duration_control=2.0, **kw
        )
        assert float(slow[3].sum()) >= float(base[3].sum())


class TestVoiceConversion:
    def test_vc(self, model_and_params):
        model, params = model_and_params
        *_, spec, spec_lengths, sid = make_batch()
        phonemes = None
        o, mask, (z, z_p, z_hat) = model.apply(
            params, spec, spec_lengths, jnp.array([0, 1]), jnp.array([2, 3]),
            method=Synthesizer.voice_conversion,
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        assert o.shape == (B, T * HOP, 1)
        assert np.isfinite(np.asarray(o)).all()

    def test_vc_same_speaker_near_identity_latent(self, model_and_params):
        model, params = model_and_params
        *_, spec, spec_lengths, sid = make_batch()
        o, mask, (z, z_p, z_hat) = model.apply(
            params, spec, spec_lengths, jnp.array([1, 1]), jnp.array([1, 1]),
            method=Synthesizer.voice_conversion,
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        # flow fwd then reverse with same conditioning inverts exactly
        np.testing.assert_allclose(np.asarray(z_hat), np.asarray(z), rtol=1e-3, atol=1e-4)


class TestDiscriminator:
    def test_shapes(self):
        mpd = MultiPeriodDiscriminator(periods=(2, 3))
        y = jnp.asarray(np.random.RandomState(0).randn(2, 64, 1).astype(np.float32))
        params = mpd.init(jax.random.PRNGKey(0), y, y)
        r_logits, g_logits, r_fmaps, g_fmaps = mpd.apply(params, y, y * 0.5)
        assert len(r_logits) == 3  # S + 2 periods
        for rl in r_logits:
            assert rl.ndim == 2 and rl.shape[0] == 2
        assert len(r_fmaps[0]) == 7  # 6 convs + post for DiscriminatorS


class TestFoldedMRFTraining:
    """The polyphase-folded MRF (ops/folded_mrf.py) is pure XLA and
    differentiable — when enabled for training (Generator.folded_narrow,
    cfg.train.folded_mrf) both the forward and the GRADIENTS must match the
    plain ResBlock path (same math, different association)."""

    def _gen(self, folded):
        from vispeech_tpu.models.generator import Generator

        return Generator(
            resblock="1", resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)),
            upsample_rates=(4, 2), upsample_initial_channel=64,
            upsample_kernel_sizes=(8, 4), gin_channels=8,
            folded_narrow=folded,
        )

    def test_forward_and_grads_match_xla(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
        g = jnp.asarray(rng.randn(2, 1, 8), jnp.float32)
        ref, fold = self._gen(False), self._gen(True)
        params = ref.init(jax.random.PRNGKey(0), x, g)

        def loss(model, p):
            y = model.apply(p, x, g)
            return jnp.sum(y * y), y

        (l0, y0), g0 = jax.value_and_grad(
            lambda p: loss(ref, p), has_aux=True)(params)
        (l1, y1), g1 = jax.value_and_grad(
            lambda p: loss(fold, p), has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        for path, leaf in flat0:
            other = flat1[path]
            scale = max(float(jnp.max(jnp.abs(leaf))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(other) / scale, np.asarray(leaf) / scale,
                rtol=2e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(path),
            )
