"""Pipeline parallelism (parallel/pipeline.py): the 2-stage GPipe split of
Synthesizer.infer must be sample-for-sample identical to the single-device
path, and the infer_prior/infer_decode seam must compose back to infer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vispeech_tpu.config import config_from_dict
from vispeech_tpu.models import Synthesizer

# the parallelism tests exercise an 8-way virtual CPU mesh (conftest); the
# single-chip TPU tier cannot host them — multi-chip coverage stays on the
# CPU tier + the driver's dryrun_multichip
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


TINY = {
    "train": {"segment_size": 256},
    "data": {
        "sampling_rate": 16000, "filter_length": 128, "hop_length": 64,
        "win_length": 128, "n_speakers": 4,
    },
    "model": {
        "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
        "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.0,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "upsample_rates": [8, 4, 2], "upsample_initial_channel": 64,
        "upsample_kernel_sizes": [16, 8, 4], "gin_channels": 8,
    },
}

B, N, T = 4, 8, 32
N_VOCAB = 40


@pytest.fixture(scope="module")
def model_and_inputs():
    cfg = config_from_dict(TINY)
    model = Synthesizer.from_config(cfg, N_VOCAB)
    r = np.random.RandomState(0)
    ph = jnp.asarray(r.randint(1, N_VOCAB, (B, N)), jnp.int32)
    lens = jnp.full((B,), N, jnp.int32)
    sid = jnp.asarray(r.randint(0, 4, (B,)), jnp.int32)
    eps = jnp.asarray(r.randn(B, T, 16).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ph, lens, T, sid=sid, method=Synthesizer.infer,
    )
    return model, variables, ph, lens, sid, eps


def single_device_audio(model, variables, ph, lens, sid, eps):
    audio, *_ = jax.jit(
        lambda v, p, l, s, e: model.apply(
            v, p, l, T, sid=s, noise_scale=0.667, eps=e,
            method=Synthesizer.infer,
        )
    )(variables, ph, lens, sid, eps)
    return np.asarray(audio)


class TestStageSeam:
    def test_prior_then_decode_equals_infer(self, model_and_inputs):
        model, variables, ph, lens, sid, eps = model_and_inputs
        ref = single_device_audio(model, variables, ph, lens, sid, eps)
        z_p, mask, *_ = model.apply(
            variables, ph, lens, T, sid=sid, noise_scale=0.667, eps=eps,
            method=Synthesizer.infer_prior,
        )
        audio, _, _ = model.apply(
            variables, z_p, mask, sid=sid, method=Synthesizer.infer_decode,
        )
        np.testing.assert_allclose(np.asarray(audio), ref, atol=1e-6)

    def test_infer_rng_noise_unchanged(self, model_and_inputs):
        """eps=None still draws from the 'sample' stream (old behavior)."""
        model, variables, ph, lens, sid, _ = model_and_inputs
        a1, *_ = model.apply(
            variables, ph, lens, T, sid=sid, method=Synthesizer.infer,
            rngs={"sample": jax.random.PRNGKey(7)},
        )
        a2, *_ = model.apply(
            variables, ph, lens, T, sid=sid, method=Synthesizer.infer,
            rngs={"sample": jax.random.PRNGKey(7)},
        )
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


class TestPipelineParallel:
    @pytest.mark.parametrize("microbatches", [2, 4])
    def test_matches_single_device(self, model_and_inputs, microbatches):
        from vispeech_tpu.parallel.pipeline import make_synthesizer_pipeline

        model, variables, ph, lens, sid, eps = model_and_inputs
        ref = single_device_audio(model, variables, ph, lens, sid, eps)

        mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("stage",))
        pipe = jax.jit(make_synthesizer_pipeline(
            model, mesh, t_frames=T, microbatches=microbatches,
            noise_scale=0.667,
        ))
        out = np.asarray(pipe(variables, ph, lens, sid, eps))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_rejects_wrong_axis_size(self, model_and_inputs):
        from vispeech_tpu.parallel.pipeline import make_synthesizer_pipeline

        model, *_ = model_and_inputs
        mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("stage",))
        with pytest.raises(ValueError, match="stage"):
            make_synthesizer_pipeline(model, mesh, t_frames=T, microbatches=2)
