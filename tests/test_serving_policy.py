"""The TPU serving configuration, tested off-hardware.

Round-1 regression: `Synthesizer._decode` selected bf16 + fused kernels from
env vars + `jax.default_backend()` inside traced code, so the combination
that ships on TPU had zero CPU test coverage — and shipped broken (f32 folded
MRF weights vs bf16 activations, ops/folded_mrf.py).  Policy is now explicit
jit-static model config (ops/policy.py); these tests run the decoder in
bfloat16 with fused=True on CPU (Pallas kernels in interpret mode) — the
exact program that serves on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.config import config_from_dict
from vispeech_tpu.models import Synthesizer
from vispeech_tpu.ops.policy import (
    FLOAT32_XLA,
    ServingPolicy,
    default_serving_policy,
)

N_VOCAB = 40


@pytest.fixture(scope="module")
def tiny_cfg():
    # upsample channels chosen so the fused dispatch exercises BOTH fused
    # tiers: ch=64 (Pallas mrf_stack) and ch=32 (polyphase-folded MRF) —
    # the tier that shipped broken in round 1.
    return config_from_dict({
        "train": {"segment_size": 512, "batch_size": 1},
        "data": {
            "sampling_rate": 16000, "filter_length": 128, "hop_length": 64,
            "win_length": 128, "n_speakers": 4,
        },
        "model": {
            "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "resblock": "1", "resblock_kernel_sizes": [3, 7],
            "resblock_dilation_sizes": [[1, 3], [1, 3]],
            "upsample_rates": [8, 4, 2], "upsample_initial_channel": 128,
            "upsample_kernel_sizes": [16, 8, 4], "gin_channels": 8,
        },
    })


def _infer(model, tiny_cfg, t_frames=32):
    B, N = 1, 8
    rng = np.random.RandomState(0)
    ph = jnp.asarray(rng.randint(1, N_VOCAB, (B, N)), jnp.int32)
    lens = jnp.full((B,), N, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ph, lens, t_frames, sid=sid, method=Synthesizer.infer,
    )

    @jax.jit
    def run(variables):
        return model.apply(
            variables, ph, lens, t_frames, sid=sid, noise_scale=0.667,
            method=Synthesizer.infer,
            rngs={"sample": jax.random.PRNGKey(2)},
        )[0]

    return variables, run(variables)


def test_bf16_fused_serving_runs_on_cpu(tiny_cfg):
    """The exact TPU serving program (bf16 decoder + fused MRF dispatch,
    Pallas in interpret mode) compiles and runs on CPU."""
    policy = ServingPolicy(
        decode_dtype="bfloat16", fused_decode=True, attn_pallas=True
    )
    model = Synthesizer.from_config(tiny_cfg, N_VOCAB, policy=policy)
    _, audio = _infer(model, tiny_cfg)
    assert audio.dtype == jnp.float32  # waveform contract: f32 out
    assert bool(jnp.isfinite(audio).all())
    assert float(jnp.abs(audio).max()) <= 1.0 + 1e-6


def test_bf16_fused_matches_f32_xla(tiny_cfg):
    """Same params, same RNG: the bf16+fused output tracks the f32 XLA
    reference path within bf16 tolerance (policy changes dtype/kernels, not
    the computation)."""
    fast = Synthesizer.from_config(
        tiny_cfg, N_VOCAB,
        policy=ServingPolicy("bfloat16", True, attn_pallas=False),
    )
    ref = Synthesizer.from_config(tiny_cfg, N_VOCAB, policy=FLOAT32_XLA)
    variables, audio_ref = _infer(ref, tiny_cfg)

    B, N, t_frames = 1, 8, 32
    rng = np.random.RandomState(0)
    ph = jnp.asarray(rng.randint(1, N_VOCAB, (B, N)), jnp.int32)
    lens = jnp.full((B,), N, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    audio_fast = jax.jit(lambda v: fast.apply(
        v, ph, lens, t_frames, sid=sid, noise_scale=0.667,
        method=Synthesizer.infer, rngs={"sample": jax.random.PRNGKey(2)},
    )[0])(variables)

    a, b = np.asarray(audio_ref), np.asarray(audio_fast)
    # tanh-bounded waveform; bf16 has ~2-3 decimal digits
    assert np.max(np.abs(a - b)) < 0.08, np.max(np.abs(a - b))
    assert np.mean(np.abs(a - b)) < 0.01


def test_policy_is_static_config_not_env(tiny_cfg, monkeypatch):
    """Constructed policy wins over env: env escape hatches act only at
    default_serving_policy() resolution time, never in traced code."""
    monkeypatch.setenv("VISPEECH_DISABLE_BF16_DECODER", "1")
    monkeypatch.setenv("VISPEECH_DISABLE_PALLAS", "1")
    model = Synthesizer.from_config(
        tiny_cfg, N_VOCAB,
        policy=ServingPolicy("bfloat16", True, attn_pallas=False),
    )
    _, audio = _infer(model, tiny_cfg)
    assert bool(jnp.isfinite(audio).all())
    # and the resolver itself honors the env (on any backend → float32/XLA)
    p = default_serving_policy()
    assert p.decode_dtype == "float32" and not p.fused_decode


def test_default_policy_per_backend():
    assert default_serving_policy("cpu") == FLOAT32_XLA
    p = default_serving_policy("tpu")
    assert p.decode_dtype == "bfloat16" and p.fused_decode and p.attn_pallas


def test_voice_conversion_under_bf16_policy(tiny_cfg):
    """_decode is shared by infer and voice_conversion — cover VC too."""
    model = Synthesizer.from_config(
        tiny_cfg, N_VOCAB,
        policy=ServingPolicy("bfloat16", True, attn_pallas=False),
    )
    B, T, C = 1, 32, tiny_cfg.data.spec_channels
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        spec, lens, jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
        method=Synthesizer.voice_conversion,
    )
    audio, _, _ = jax.jit(lambda v: model.apply(
        v, spec, lens, jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
        method=Synthesizer.voice_conversion, rngs={"sample": jax.random.PRNGKey(2)},
    ))(variables)
    assert audio.dtype == jnp.float32
    assert bool(jnp.isfinite(audio).all())
