"""End-to-end numerical parity vs the PyTorch reference (the BASELINE.md
"mel allclose at fixed seeds" north star).

The reference repo at /root/reference is imported READ-ONLY as a test oracle:
we instantiate its `SynthesizerTrn` (models.py:532-732) with random torch
weights, map every parameter into our flax `Synthesizer` (the parameter
layouts were designed torch-compatible — see ops/layers.py docstring), run
both models' full inference path on identical inputs, and assert the outputs
agree: text-encoder states, prosody-predictor outputs, prior stats
(m_p/logs_p), flow forward, posterior stats, the waveform, and its mel.

This proves behavioral parity of every deterministic component in one shot:
TextEncoder, DurationPredictor, PitchPredictor, EnergyPredictor, prenets,
LengthRegulator, FramePriorNet, Projection, ResidualCouplingBlock (both
directions), PosteriorEncoder stats, and the HiFi-GAN Generator (weight-norm
convs + transposed-conv upsampling + MRF).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")  # oracle only — never copied

# torch-oracle numerical parity: minutes of compile + oracle eval
pytestmark = pytest.mark.slow

import flax
from vispeech_tpu.models.synthesizer import Synthesizer

# ---- tiny-but-complete architecture (every component exercised) ----
N_VOCAB = 40
SPEC_CHANNELS = 65
HOP = 64
SEGMENT_FRAMES = 8
HIDDEN = 32
FILTER = 64
N_HEADS = 2
N_LAYERS = 2
KERNEL = 3
RESBLOCK_KERNELS = (3, 7)
RESBLOCK_DILATIONS = ((1, 3, 5), (1, 3, 5))
UP_RATES = (8, 4, 2)
UP_INIT = 64
UP_KERNELS = (16, 8, 4)
GIN = 16
N_SPEAKERS = 4

B, N = 2, 12
LENGTHS = (12, 9)


def _build_torch_model():
    import models as ref_models  # /root/reference/models.py

    torch.manual_seed(0)
    m = ref_models.SynthesizerTrn(
        n_vocab=N_VOCAB,
        spec_channels=SPEC_CHANNELS,
        hop_length=HOP,
        sampling_rate=16000,
        segment_size=SEGMENT_FRAMES,
        inter_channels=HIDDEN,
        hidden_channels=HIDDEN,
        filter_channels=FILTER,
        n_heads=N_HEADS,
        n_layers=N_LAYERS,
        kernel_size=KERNEL,
        p_dropout=0.1,
        resblock="1",
        resblock_kernel_sizes=list(RESBLOCK_KERNELS),
        resblock_dilation_sizes=[list(d) for d in RESBLOCK_DILATIONS],
        upsample_rates=list(UP_RATES),
        upsample_initial_channel=UP_INIT,
        upsample_kernel_sizes=list(UP_KERNELS),
        n_speakers=N_SPEAKERS,
        gin_channels=GIN,
    )
    m.eval()
    return m


def _build_flax_model():
    return Synthesizer(
        n_vocab=N_VOCAB,
        spec_channels=SPEC_CHANNELS,
        segment_size=SEGMENT_FRAMES,
        inter_channels=HIDDEN,
        hidden_channels=HIDDEN,
        filter_channels=FILTER,
        n_heads=N_HEADS,
        n_layers=N_LAYERS,
        kernel_size=KERNEL,
        p_dropout=0.1,
        resblock="1",
        resblock_kernel_sizes=RESBLOCK_KERNELS,
        resblock_dilation_sizes=RESBLOCK_DILATIONS,
        upsample_rates=UP_RATES,
        upsample_initial_channel=UP_INIT,
        upsample_kernel_sizes=UP_KERNELS,
        n_speakers=N_SPEAKERS,
        gin_channels=GIN,
    )


# ---- weight mapping now ships in the framework (utils/reference_import,
# promoted from this test per round-2 review); the test exercises the
# shipped code path.
from vispeech_tpu.utils.reference_import import map_reference_state_dict


def map_reference_weights(torch_model, flax_params, n_kernels=None):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return map_reference_state_dict(
        sd, flax_params,
        n_resblock_kernels=(n_kernels if n_kernels is not None
                            else len(RESBLOCK_KERNELS)),
    )


@pytest.fixture(scope="module")
def parity():
    tm = _build_torch_model()
    fm = _build_flax_model()

    r = np.random.RandomState(7)
    phonemes = r.randint(1, N_VOCAB, size=(B, N)).astype(np.int64)
    duration = r.randint(1, 5, size=(B, N)).astype(np.float32)
    for b, L in enumerate(LENGTHS):
        phonemes[b, L:] = 0
        duration[b, L:] = 0
    lengths = np.asarray(LENGTHS, np.int64)
    sid = np.asarray([1, 3], np.int64)
    t_frames = int(duration.sum(1).max())

    # init through the TRAINING forward so every submodule (incl. enc_q and
    # the flow's forward direction) materializes its parameters
    spec0 = jnp.zeros((B, t_frames, SPEC_CHANNELS), jnp.float32)
    params = fm.init(
        {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        jnp.asarray(phonemes, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(np.maximum(duration * 50.0 + 80.0, 80.0)),  # f0 Hz
        jnp.asarray(duration * 10.0 + 30.0),                     # energy
        jnp.asarray(duration),
        spec0,
        jnp.asarray(duration.sum(1).astype(np.int32)),
        sid=jnp.asarray(sid, jnp.int32),
        deterministic=True,
    )
    params = map_reference_weights(tm, params)
    return tm, fm, params, phonemes, lengths, duration, sid, t_frames


def _run_torch_infer(tm, phonemes, lengths, duration, sid):
    with torch.no_grad():
        return tm.infer(
            torch.from_numpy(phonemes),
            torch.from_numpy(lengths),
            sid=torch.from_numpy(sid),
            noise_scale=0.0,
            duration_control=torch.from_numpy(duration),
        )


def _run_flax_infer(fm, params, phonemes, lengths, duration, sid, t_frames):
    return fm.apply(
        params,
        jnp.asarray(phonemes, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        t_frames,
        sid=jnp.asarray(sid, jnp.int32),
        noise_scale=0.0,
        duration_control=jnp.asarray(duration),
        method=Synthesizer.infer,
        rngs={"sample": jax.random.PRNGKey(5)},
    )


def test_full_inference_parity(parity):
    """Waveform + prior stats + prosody outputs match the reference."""
    tm, fm, params, phonemes, lengths, duration, sid, t_frames = parity
    o_t, mask_t, (z_t, zp_t, mp_t, logsp_t), dur_t, f0_t, en_t = _run_torch_infer(
        tm, phonemes, lengths, duration, sid
    )
    o_j, mask_j, (z_j, zp_j, mp_j, logsp_j), dur_j, f0_j, en_j = _run_flax_infer(
        fm, params, phonemes, lengths, duration, sid, t_frames
    )

    # prior stats ([B,C,T] torch vs [B,T,C] ours)
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(mp_j), 1, 2), mp_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(logsp_j), 1, 2), logsp_t.numpy(), atol=2e-4, rtol=1e-3
    )
    # latent after flow reverse
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(z_j), 1, 2), z_t.numpy(), atol=5e-4, rtol=1e-3
    )
    # prosody returns (per-phoneme F0 drives the GUI slider contract)
    np.testing.assert_allclose(np.asarray(f0_j), f0_t.numpy(), atol=0.15, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(en_j)[..., 0] if np.asarray(en_j).ndim == 3 else np.asarray(en_j),
        en_t.numpy()[:, 0] if en_t.numpy().ndim == 3 else en_t.numpy(),
        atol=5e-3, rtol=1e-3,
    )
    # the waveform itself
    wav_t = o_t.numpy()[:, 0, :]
    wav_j = np.asarray(o_j)[..., 0]
    assert wav_j.shape == wav_t.shape
    np.testing.assert_allclose(wav_j, wav_t, atol=2e-3, rtol=0)


def test_mel_allclose(parity):
    """BASELINE.md north star: mel of our audio ≈ mel of reference audio."""
    from vispeech_tpu.dsp.stft import mel_spectrogram

    tm, fm, params, phonemes, lengths, duration, sid, t_frames = parity
    o_t, *_ = _run_torch_infer(tm, phonemes, lengths, duration, sid)
    o_j, *_ = _run_flax_infer(fm, params, phonemes, lengths, duration, sid, t_frames)
    wav_t = jnp.asarray(o_t.numpy()[:, 0, :])
    wav_j = jnp.asarray(np.asarray(o_j)[..., 0])

    def mel_of(w):
        return mel_spectrogram(w, 128, 16, 16000, 64, 128, 0.0, 8000.0)

    mel_t, mel_j = mel_of(wav_t), mel_of(wav_j)
    l1 = float(jnp.mean(jnp.abs(mel_t - mel_j)))
    assert l1 < 5e-3, f"mel L1 vs reference = {l1}"
    np.testing.assert_allclose(np.asarray(mel_j), np.asarray(mel_t), atol=0.05)


def test_predictor_parity(parity):
    """Duration logw / pitch LF0 predictions match the reference heads."""
    tm, fm, params, phonemes, lengths, duration, sid, t_frames = parity
    ph_t = torch.from_numpy(phonemes)
    with torch.no_grad():
        g = tm.emb_g(torch.from_numpy(sid)).unsqueeze(-1)
        x_t, xm_t = tm.enc_p(ph_t, torch.from_numpy(lengths))
        logw_t = tm.duration_predictor(x_t, xm_t, g=g)
        lf0_t = tm.pitch_predictor(x_t, xm_t, g=g)

    def flax_heads(params, ph, lens, sid):
        def inner(m):
            g = m._speaker(sid)
            x, xm = m.enc_p(ph, lens)
            return (
                x * xm,
                m.duration_predictor(x, xm, g=g),
                m.pitch_predictor(x, xm, g=g),
            )
        return fm.apply(params, method=inner)

    x_j, logw_j, lf0_j = flax_heads(
        params,
        jnp.asarray(phonemes, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(sid, jnp.int32),
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(x_j), 1, 2), (x_t * xm_t).numpy(),
        atol=2e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(logw_j)[..., 0], logw_t.numpy()[:, 0], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(lf0_j), lf0_t.numpy(), atol=2e-4, rtol=1e-3)


def test_flow_and_posterior_parity(parity):
    """Flow forward direction + posterior-encoder stats match (the training
    and voice-conversion directions, complementing infer's flow reverse)."""
    tm, fm, params, phonemes, lengths, duration, sid, t_frames = parity
    r = np.random.RandomState(11)
    T = 20
    z = r.randn(B, HIDDEN, T).astype(np.float32)
    spec = r.randn(B, SPEC_CHANNELS, T).astype(np.float32)
    spec_lengths = np.asarray([20, 15], np.int64)
    mask = (np.arange(T)[None, :] < spec_lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        g = tm.emb_g(torch.from_numpy(sid)).unsqueeze(-1)
        zp_t = tm.flow(
            torch.from_numpy(z), torch.from_numpy(mask[:, None, :]), g=g
        )
        import models as ref_models  # noqa: F811

        # posterior stats are deterministic; only the sample is random
        x_t = tm.enc_q.pre(torch.from_numpy(spec)) * torch.from_numpy(mask[:, None, :])
        x_t = tm.enc_q.enc(x_t, torch.from_numpy(mask[:, None, :]), g=g)
        stats_t = tm.enc_q.proj(x_t) * torch.from_numpy(mask[:, None, :])
        mq_t, logsq_t = torch.split(stats_t, HIDDEN, dim=1)

    def flax_flow_and_stats(m):
        gj = m._speaker(jnp.asarray(sid, jnp.int32))
        zj = jnp.swapaxes(jnp.asarray(z), 1, 2)
        mj = jnp.asarray(mask)[..., None]
        zp = m.flow(zj, mj, g=gj)
        _, mq, logsq, _ = m.enc_q(
            jnp.swapaxes(jnp.asarray(spec), 1, 2),
            jnp.asarray(spec_lengths, jnp.int32),
            g=gj,
        )
        return zp, mq, logsq

    zp_j, mq_j, logsq_j = fm.apply(
        params, method=flax_flow_and_stats, rngs={"sample": jax.random.PRNGKey(3)}
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(zp_j), 1, 2), zp_t.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(mq_j), 1, 2), mq_t.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(logsq_j), 1, 2), logsq_t.numpy(), atol=5e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Flagship-scale checkpoint import + parity (reference configs/config.json:
# 192 hidden, 768 filter, 4 layers, k 3/7/11, 16-layer WN, rates 8·8·4·2).
# Exercises tools/import_reference_checkpoint.py end-to-end: a random-init
# torch SynthesizerTrn saved as G_0.pth → imported npz → TTSEngine serves it,
# and the audio mel-matches the torch oracle.
# ---------------------------------------------------------------------------

FLAGSHIP_CONFIG = "/root/reference/configs/config.json"


@pytest.mark.skipif(
    not os.path.exists(FLAGSHIP_CONFIG), reason="reference repo not mounted"
)
class TestFlagshipImport:
    @pytest.fixture(scope="class")
    def imported(self, tmp_path_factory):
        import importlib.util
        import json

        tmp = tmp_path_factory.mktemp("flagship")
        with open(FLAGSHIP_CONFIG, encoding="utf-8") as f:
            ref_cfg = json.load(f)

        import models as ref_models  # /root/reference/models.py (oracle)
        from vispeech_tpu.text.symbols import N_SYMBOLS

        torch.manual_seed(0)
        tm = ref_models.SynthesizerTrn(
            N_SYMBOLS,
            ref_cfg["data"]["filter_length"] // 2 + 1,
            ref_cfg["data"]["hop_length"],
            ref_cfg["data"]["sampling_rate"],
            ref_cfg["train"]["segment_size"] // ref_cfg["data"]["hop_length"],
            n_speakers=ref_cfg["data"]["n_speakers"],
            **ref_cfg["model"],
        )
        tm.eval()
        pth = tmp / "G_0.pth"
        torch.save(
            {"model": tm.state_dict(), "iteration": 0, "learning_rate": 1e-4},
            pth,
        )
        cfg_path = tmp / "config.json"
        cfg_path.write_text(json.dumps(ref_cfg))

        spec = importlib.util.spec_from_file_location(
            "import_reference_checkpoint",
            "/root/repo/tools/import_reference_checkpoint.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out_dir = tmp / "imported"
        npz_path = mod.import_checkpoint(str(cfg_path), str(pth), str(out_dir))
        assert npz_path.endswith("ckpt_0.npz") and os.path.exists(npz_path)
        return tm, str(out_dir)

    def test_import_and_mel_parity(self, imported):
        """TTSEngine output of the imported flagship checkpoint mel-matches
        the torch oracle at noise_scale=0 with pinned durations."""
        from vispeech_tpu.dsp.stft import mel_spectrogram
        from vispeech_tpu.infer.pipeline import TTSEngine
        from vispeech_tpu.text.symbols import SYMBOL_TO_ID

        tm, out_dir = imported
        engine = TTSEngine.from_checkpoint(
            os.path.join(out_dir, "config.json"), out_dir
        )
        phones = ["n", "i2", "h", "ao3", "sh", "iii4", "j", "ie4", "sp", "."]
        durs = np.asarray([3, 4, 2, 4, 3, 4, 2, 4, 2, 2], np.float32)
        out = engine.synthesize(
            phones=phones, speaker=1, noise_scale=0.0, duration_control=durs
        )
        wav_j = np.asarray(out["audio"], np.float32)

        ids = np.asarray([[SYMBOL_TO_ID[p] for p in phones]], np.int64)
        with torch.no_grad():
            o_t, *_ = tm.infer(
                torch.from_numpy(ids),
                torch.LongTensor([len(phones)]),
                sid=torch.LongTensor([1]),
                noise_scale=0.0,
                duration_control=torch.from_numpy(durs[None]),
            )
        wav_t = o_t.numpy()[0, 0]
        n = min(wav_j.shape[0], wav_t.shape[0])
        assert n == wav_t.shape[0]  # ours pads to the bucket, oracle length le

        def mel_of(w):
            return mel_spectrogram(
                jnp.asarray(w[None, :n]), 2048, 80, 44100, 512, 2048, 0.0, None
            )

        mel_t, mel_j = mel_of(wav_t), mel_of(wav_j)
        l1 = float(jnp.mean(jnp.abs(mel_t - mel_j)))
        # e2e tolerance is CHAOS-bounded, not mapping-bounded: at random
        # init every stage matches the oracle to <=2e-6 (see
        # test_flagship_stage_parity below, which is the real mapping pin),
        # but the composed infer path amplifies f32 op-ordering noise
        # through 4 UNREGULARIZED random coupling layers (gain ~10x each:
        # 2e-6 -> ~2e-2 on a waveform whose rms is itself ~0.02).  Trained
        # checkpoints are regularized (the flow must invert real data), so
        # this bound is loose only for the random-weight oracle.
        assert l1 < 0.05, f"flagship mel L1 vs reference = {l1}"

    def test_flagship_stage_parity(self, imported):
        """The actual mapping pin at flagship scale: every stage of the
        imported model matches the torch oracle tightly on ITS OWN inputs
        (no cross-stage chaos): text encoder, pitch/energy heads, frame
        prior + projection stats, flow reverse, HiFi-GAN decoder."""
        import commons as ref_commons

        from vispeech_tpu.infer.pipeline import TTSEngine
        from vispeech_tpu.ops.length_regulator import length_regulate
        from vispeech_tpu.ops.masking import length_mask
        from vispeech_tpu.text.symbols import SYMBOL_TO_ID

        tm, out_dir = imported
        engine = TTSEngine.from_checkpoint(
            os.path.join(out_dir, "config.json"), out_dir
        )
        m, params = engine.model, engine.variables
        phones = ["n", "i2", "h", "ao3", "sh", "iii4", "j", "ie4", "sp", "."]
        durs = np.asarray([3, 4, 2, 4, 3, 4, 2, 4, 2, 2], np.float32)
        ids = np.asarray([[SYMBOL_TO_ID[p] for p in phones]], np.int64)
        T = int(durs.sum())

        with torch.no_grad():
            x, x_mask = tm.enc_p(torch.from_numpy(ids), torch.LongTensor([10]))
            g = tm.emb_g(torch.LongTensor([1])).unsqueeze(-1)
            lf0 = tm.pitch_predictor(x, x_mask, g=g)
            x = x + tm.pitch_prenet(lf0.unsqueeze(1))
            ne = (((tm.energy_predictor(x, g) * 36 + 60)) - 60) / 36
            x = x + tm.energy_prenet(ne.unsqueeze(1))
            xf, xl = tm.lr(x, torch.from_numpy(durs[None]), torch.LongTensor([10]))
            y_mask = torch.unsqueeze(
                ref_commons.sequence_mask(xl, xf.size(2)), 1
            )
            xf = tm.frame_prior_net(xf, y_mask)
            m_p_t, logs_p_t = tm.project(xf.transpose(1, 2), y_mask)

        def prior(mm, p, length):
            g = mm._speaker(jnp.asarray([1], jnp.int32))
            x, x_mask = mm.enc_p(p, length, deterministic=True)
            pred_lf0 = mm.pitch_predictor(x, x_mask, g=g, deterministic=True)
            x = x + mm.pitch_prenet(pred_lf0[..., None])
            pred_ne = mm.energy_predictor(x, g=g, deterministic=True)
            x = x + mm.energy_prenet(pred_ne[..., None])
            xf, fl = length_regulate(x, jnp.asarray(durs[None]), T)
            fm = length_mask(fl, T, x.dtype)
            xf = mm.frame_prior_net(xf, fm, deterministic=True)
            mp, lsp = mm.project(xf, fm)
            return pred_lf0, pred_ne, mp, lsp

        plf0, pne, mp_j, lsp_j = m.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray([10], jnp.int32),
            method=prior,
        )
        np.testing.assert_allclose(
            np.asarray(plf0), lf0.numpy(), atol=1e-4, err_msg="pred_lf0")
        np.testing.assert_allclose(
            np.asarray(pne), ne.numpy(), atol=1e-4, err_msg="energy")
        np.testing.assert_allclose(
            np.asarray(mp_j).transpose(0, 2, 1), m_p_t.numpy(), atol=1e-4,
            err_msg="m_p")
        np.testing.assert_allclose(
            np.asarray(lsp_j).transpose(0, 2, 1), logs_p_t.numpy(), atol=1e-4,
            err_msg="logs_p")

        # flow reverse + decoder on identical fixed inputs
        rng = np.random.RandomState(0)
        zp = rng.randn(1, 192, T).astype(np.float32)
        gz = rng.randn(1, 256, 1).astype(np.float32) * 0.1
        mask = np.ones((1, 1, T), np.float32)
        with torch.no_grad():
            zf_t = tm.flow(torch.from_numpy(zp), torch.from_numpy(mask),
                           g=torch.from_numpy(gz), reverse=True).numpy()
            y_t = tm.dec(torch.from_numpy(zp * 0.5),
                         g=torch.from_numpy(gz)).numpy()[0, 0]
        zf_j = m.apply(
            params, jnp.asarray(zp.transpose(0, 2, 1)),
            jnp.asarray(mask.transpose(0, 2, 1)),
            method=lambda mm, a, mk: mm.flow(
                a, mk, g=jnp.asarray(gz.transpose(0, 2, 1)), reverse=True),
        )
        np.testing.assert_allclose(
            np.asarray(zf_j).transpose(0, 2, 1), zf_t, atol=2e-5,
            err_msg="flow reverse")
        y_j = m.apply(
            params, jnp.asarray(zp.transpose(0, 2, 1)) * 0.5,
            method=lambda mm, a: mm.dec(
                a, g=jnp.asarray(gz.transpose(0, 2, 1))),
        )
        np.testing.assert_allclose(
            np.asarray(y_j)[0, : y_t.shape[0], 0], y_t, atol=1e-5,
            err_msg="decoder")

    def test_prosody_heads_match(self, imported):
        """Predicted per-phoneme duration/F0 from the imported params match
        the torch heads (the values the GUI slider contract exposes).
        Durations are pinned in the synthesize call (same shapes as the mel
        test → compiled program reuse); the duration head is compared via
        the engine's duration pass directly."""
        from vispeech_tpu.infer.pipeline import TTSEngine
        from vispeech_tpu.text.symbols import SYMBOL_TO_ID

        tm, out_dir = imported
        engine = TTSEngine.from_checkpoint(
            os.path.join(out_dir, "config.json"), out_dir
        )
        phones = ["n", "i2", "h", "ao3", "sh", "iii4", "j", "ie4", "sp", "."]
        durs = np.asarray([3, 4, 2, 4, 3, 4, 2, 4, 2, 2], np.float32)
        n = len(phones)
        out = engine.synthesize(
            phones=phones, speaker=2, noise_scale=0.0, duration_control=durs
        )
        ids = np.asarray([[SYMBOL_TO_ID[p] for p in phones]], np.int64)
        with torch.no_grad():
            _, _, _, _, f0_t, _ = tm.infer(
                torch.from_numpy(ids),
                torch.LongTensor([n]),
                sid=torch.LongTensor([2]),
                noise_scale=0.0,
                duration_control=torch.from_numpy(durs[None]),
            )
        np.testing.assert_allclose(
            np.asarray(out["f0"], np.float32),
            f0_t.numpy().reshape(-1).astype(np.float32),
            rtol=5e-3, atol=0.5,
        )

        # duration head: max(ceil(exp(logw)·mask − 1), 0) on both sides;
        # tolerate ±1 frame at ceil boundaries (float noise across backends)
        phonemes, lengths, _ = engine._encode(phones)
        dur_fn = engine._get_duration_fn(int(phonemes.shape[1]))
        pred = np.asarray(jax.device_get(dur_fn(
            engine.variables, phonemes, lengths, jnp.asarray([2], jnp.int32)
        ))).reshape(-1)
        with torch.no_grad():
            g = tm.emb_g(torch.LongTensor([2])).unsqueeze(-1)
            x_t, xm_t = tm.enc_p(torch.from_numpy(ids), torch.LongTensor([n]))
            logw = tm.duration_predictor(x_t, xm_t, g=g)
            w_t = torch.clamp_min(
                torch.ceil(torch.exp(logw) * xm_t - 1.0), 0.0
            ).numpy()[0, 0]
        diff = np.abs(pred[:n] - w_t[:n])
        assert diff.max() <= 1.0 and (diff == 0).mean() >= 0.8, (pred[:n], w_t[:n])
