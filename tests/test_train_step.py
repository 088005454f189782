"""GAN train-step test on a tiny config: one jitted step runs, losses finite,
parameters actually update, RNG state advances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispeech_tpu.config import Config, config_from_dict
from vispeech_tpu.train.step import Batch, create_train_state, make_train_step

TINY_CFG = config_from_dict({
    "train": {
        "segment_size": 64,  # 8 frames at hop 8
        "batch_size": 2,
        "fp16_run": False,
        "learning_rate": 2e-4,
        "c_mel": 45,
        "c_kl": 1.0,
    },
    "data": {
        "sampling_rate": 8000,
        "filter_length": 16,
        "hop_length": 8,
        "win_length": 16,
        "n_mel_channels": 8,
        "n_speakers": 4,
    },
    "model": {
        "inter_channels": 8,
        "hidden_channels": 8,
        "filter_channels": 16,
        "n_heads": 2,
        "n_layers": 1,
        "kernel_size": 3,
        "p_dropout": 0.1,
        "resblock": "1",
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "upsample_rates": [4, 2],
        "upsample_initial_channel": 16,
        "upsample_kernel_sizes": [8, 4],
        "gin_channels": 6,
    },
})

B, N, T, HOP = 2, 6, 16, 8


def make_batch(rng=0) -> Batch:
    r = np.random.RandomState(rng)
    dur = r.randint(1, 4, size=(B, N))
    spec_lengths = dur.sum(1)
    wav_lengths = spec_lengths * HOP
    return Batch(
        phonemes=jnp.asarray(r.randint(1, 40, size=(B, N))),
        phoneme_lengths=jnp.asarray([N, N]),
        f0=jnp.asarray(r.uniform(80, 400, (B, N)).astype(np.float32)),
        energy=jnp.asarray(r.uniform(30, 90, (B, N)).astype(np.float32)),
        duration=jnp.asarray(dur),
        spec=jnp.asarray(r.randn(B, T, 9).astype(np.float32)),
        spec_lengths=jnp.asarray(spec_lengths),
        wav=jnp.asarray(
            np.clip(r.randn(B, T * HOP, 1) * 0.2, -1, 1).astype(np.float32)
        ),
        wav_lengths=jnp.asarray(wav_lengths),
        sid=jnp.asarray([0, 2]),
    )


def test_train_step_runs_and_updates():
    batch = make_batch()
    state, model_g, model_d = create_train_state(
        TINY_CFG, jax.random.PRNGKey(0), n_vocab=40, batch=batch, steps_per_epoch=10
    )
    step_fn = jax.jit(make_train_step(TINY_CFG, model_g, model_d, steps_per_epoch=10))

    p0 = jax.tree_util.tree_leaves(state.params_g)[0].copy()
    state2, metrics = step_fn(state, batch)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert int(state2.step) == 1
    # at least one parameter moved in both networks
    moved_g = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params_g),
            jax.tree_util.tree_leaves(state2.params_g),
        )
    )
    moved_d = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params_d),
            jax.tree_util.tree_leaves(state2.params_d),
        )
    )
    assert moved_g and moved_d
    # rng advanced
    assert not np.array_equal(np.asarray(state.rng), np.asarray(state2.rng))

    # second step with same jitted fn
    state3, metrics3 = step_fn(state2, make_batch(1))
    assert int(state3.step) == 2
    assert np.isfinite(float(metrics3["loss/g/total"]))


@pytest.mark.slow  # second full GAN-step compile (fused-WN config)
def test_train_step_fused_wn_matches_xla():
    """cfg.train.fused_wn routes the posterior/flow WN stacks through the
    differentiable Pallas kernel (interpret mode on CPU); one full GAN step
    must produce the same losses and parameter updates as the XLA path."""
    import dataclasses

    fused_cfg = dataclasses.replace(
        TINY_CFG, train=dataclasses.replace(TINY_CFG.train, fused_wn=True)
    )
    batch = make_batch()
    results = {}
    for name, cfg in (("xla", TINY_CFG), ("fused", fused_cfg)):
        state, model_g, model_d = create_train_state(
            cfg, jax.random.PRNGKey(0), n_vocab=40, batch=batch,
            steps_per_epoch=10,
        )
        step_fn = jax.jit(make_train_step(cfg, model_g, model_d, steps_per_epoch=10))
        new_state, metrics = step_fn(state, batch)
        results[name] = (jax.device_get(new_state.params_g), jax.device_get(metrics))

    for k in results["xla"][1]:
        np.testing.assert_allclose(
            float(results["fused"][1][k]), float(results["xla"][1][k]),
            rtol=2e-3, atol=2e-4, err_msg=f"metric {k}",
        )
    flat_a = jax.tree_util.tree_leaves(results["xla"][0])
    flat_b = jax.tree_util.tree_leaves(results["fused"][0])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4
        )


def test_train_step_bf16_only_stage():
    """Diagnostic per-stage bf16 cast (cfg.train.bf16_only): the step runs,
    losses stay finite, and only the selected stage's params are cast."""
    import dataclasses

    from vispeech_tpu.train.step import STAGE_PARAM_KEYS, g_param_cast

    cfg = dataclasses.replace(
        TINY_CFG,
        train=dataclasses.replace(
            TINY_CFG.train, fp16_run=True, bf16_only=("flow", "enc_q")
        ),
    )
    batch = make_batch()
    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), 64, batch)
    assert mg.bf16_stages == ("flow", "enc_q")

    cast = g_param_cast(cfg)
    gp = cast(state.params_g["params"])
    flow_dtypes = {a.dtype for a in jax.tree.leaves(gp["flow"])}
    dec_dtypes = {a.dtype for a in jax.tree.leaves(gp["dec"])}
    assert flow_dtypes == {jnp.dtype(jnp.bfloat16)}
    assert jnp.dtype(jnp.bfloat16) not in dec_dtypes

    step = jax.jit(make_train_step(cfg, mg, md))
    new_state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(jax.device_get(v)), k
    # master params stay f32
    assert all(
        a.dtype == jnp.float32
        for a in jax.tree.leaves(new_state.params_g)
        if jnp.issubdtype(a.dtype, jnp.floating)
    )
    # stage names cover every STAGE_PARAM_KEYS entry
    assert set(STAGE_PARAM_KEYS) == {
        "enc_p", "heads", "fpn", "project", "enc_q", "flow", "dec", "dec_body"}


def test_device_dsp_matches_host_spec_path():
    """The device-DSP pipeline (int16 wav in, masked on-device spectrogram)
    produces the same first-step losses as the host-spec path to float
    tolerance (the spec itself differs only by f64-host vs f32-device DFT
    rounding)."""
    from vispeech_tpu.dsp import spectrogram

    batch = make_batch()
    # host-path batch (f32 wav + host-computed spec is what make_batch
    # fakes with random specs — build a CONSISTENT pair instead: spec
    # derived from the wav by the reference semantics)
    d = TINY_CFG.data
    wav = np.asarray(batch.wav)
    spec = np.array(
        spectrogram(jnp.asarray(wav[..., 0]), d.filter_length,
                    d.sampling_rate, d.hop_length, d.win_length))
    # zero the padded frames like collate does
    for i, t in enumerate(np.asarray(batch.spec_lengths)):
        spec[i, int(t):] = 0.0
    host_batch = batch._replace(spec=jnp.asarray(spec))
    dev_batch = batch._replace(
        spec=None,
        wav=jnp.asarray((wav * 32768.0).astype(np.int16)),
    )
    # max_wav_value is 32768 in TINY_CFG (default)
    assert TINY_CFG.data.max_wav_value == 32768.0

    state, mg, md = create_train_state(
        TINY_CFG, jax.random.PRNGKey(0), 64, host_batch)
    step = jax.jit(make_train_step(TINY_CFG, mg, md))
    _, m_host = step(state, host_batch)
    _, m_dev = step(state, dev_batch)
    m_host, m_dev = jax.device_get((m_host, m_dev))
    for k in m_host:
        a, b = float(m_host[k]), float(m_dev[k])
        # int16 quantization of the wav perturbs mel/disc losses slightly
        assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)


def test_train_step_bf16_dec_body_tail_f32():
    """dec_body stage: decoder computes in bf16 but conv_post/tanh stay f32
    (params uncast + activation up-cast), so the output waveform is
    continuous-valued — the bf16-collapse fix candidate."""
    import dataclasses

    from vispeech_tpu.train.step import g_param_cast

    cfg = dataclasses.replace(
        TINY_CFG,
        train=dataclasses.replace(
            TINY_CFG.train, fp16_run=True, bf16_only=("dec_body",)
        ),
    )
    batch = make_batch()
    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), 64, batch)
    gp = g_param_cast(cfg)(state.params_g["params"])
    post = {a.dtype for a in jax.tree.leaves(gp["dec"]["conv_post"])}
    body = {a.dtype for a in jax.tree.leaves(gp["dec"]["up_0"])}
    assert post == {jnp.dtype(jnp.float32)}
    assert body == {jnp.dtype(jnp.bfloat16)}

    step = jax.jit(make_train_step(cfg, mg, md))
    _, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(jax.device_get(v)), k


def test_legacy_bf16_scopes_fail_loudly():
    """'stable'/'full' whole-graph casts reproduce the GAN collapse
    (BENCH_TRAIN_r04.bf16_root_cause); selecting them must raise unless
    explicitly acknowledged via bf16_allow_divergent (VERDICT r4 #7)."""
    import dataclasses

    for scope in ("stable", "full"):
        cfg = dataclasses.replace(
            TINY_CFG,
            train=dataclasses.replace(
                TINY_CFG.train, fp16_run=True, bf16_scope=scope),
        )
        with pytest.raises(ValueError, match="KNOWN to collapse"):
            cfg.train.effective_bf16_stages()
        ack = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, bf16_allow_divergent=True))
        assert ack.train.effective_bf16_stages() == ()  # whole-graph mode
    # unknown scope still raises the typo guard, not the divergence guard
    cfg = dataclasses.replace(
        TINY_CFG,
        train=dataclasses.replace(
            TINY_CFG.train, fp16_run=True, bf16_scope="everythin"),
    )
    with pytest.raises(ValueError, match="unknown bf16_scope"):
        cfg.train.effective_bf16_stages()


def test_tail_f32_scope_resolves_and_runs():
    """bf16_scope='tail_f32' (the validated converging bf16 policy) resolves
    to the full stage set with dec_body and runs a finite step — the
    regression guard for the shipped reduced-precision policy."""
    import dataclasses

    from vispeech_tpu.train.step import g_param_cast

    cfg = dataclasses.replace(
        TINY_CFG,
        train=dataclasses.replace(TINY_CFG.train, fp16_run=True),
    )
    assert cfg.train.bf16_scope == "tail_f32"  # default scope
    stages = cfg.train.effective_bf16_stages()
    assert set(stages) == {"enc_p", "heads", "fpn", "project", "enc_q",
                           "flow", "dec_body"}
    batch = make_batch()
    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), 64, batch)
    assert mg.bf16_stages == stages
    gp = g_param_cast(cfg)(state.params_g["params"])
    assert {a.dtype for a in jax.tree.leaves(gp["dec"]["conv_post"])} == {
        jnp.dtype(jnp.float32)}
    assert {a.dtype for a in jax.tree.leaves(gp["enc_q"])} == {
        jnp.dtype(jnp.bfloat16)}
    step = jax.jit(make_train_step(cfg, mg, md))
    _, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(jax.device_get(v)), k
