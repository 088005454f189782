"""Inference engine + HTTP server tests (on fresh-init weights, tiny model)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vispeech_tpu.models import Synthesizer
from vispeech_tpu.text.symbols import N_SYMBOLS

HOP = 64


@pytest.fixture(scope="module")
def engine():
    from vispeech_tpu.infer.pipeline import TTSEngine

    cfg = Config(
        train=TrainConfig(fp16_run=False, segment_size=4 * HOP),
        data=DataConfig(
            sampling_rate=8000, filter_length=256, hop_length=HOP,
            win_length=256, n_mel_channels=20, n_speakers=4,
            spk2id=(("alice", 1), ("bob", 2)),
        ),
        model=ModelConfig(
            inter_channels=16, hidden_channels=16, filter_channels=32,
            n_heads=2, n_layers=1,
            upsample_rates=(4, 4, 2, 2), upsample_initial_channel=32,
            upsample_kernel_sizes=(8, 8, 4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            gin_channels=8,
        ),
    )
    model = Synthesizer.from_config(cfg, N_SYMBOLS)
    import jax.numpy as jnp

    B, N, T = 1, 8, 16
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.ones((B, N), jnp.int32), jnp.asarray([N], jnp.int32),
        jnp.full((B, N), 150.0), jnp.full((B, N), 60.0),
        jnp.full((B, N), T // N, jnp.int32),
        jnp.zeros((B, T, cfg.data.spec_channels)), jnp.asarray([T], jnp.int32),
        jnp.zeros((B,), jnp.int32),
        deterministic=True,
    )
    # These tests assert ROUTING (speaker/controls flow end-to-end), so the
    # engine is pinned to the f32/XLA policy + float fetch.  Why: a
    # RANDOM-INIT tiny model's decode path attenuates even a wholesale z_p
    # swap to ~1e-5 output delta (small-init convs + tanh) — below both
    # bf16-decode ulp and 1 PCM LSB, so the TPU tier's default serving
    # policy would quantize distinct speakers bit-identical and the
    # assertions could not see the (correct) conditioning.  The TPU policy's
    # numerics are covered by test_serving_policy + the kernel parity
    # tests; the trained-checkpoint closure (bench_trained_serving) proves
    # real input sensitivity on the flagship model.
    from vispeech_tpu.ops.policy import FLOAT32_XLA

    return TTSEngine(cfg, variables, policy=FLOAT32_XLA,
                     transfer_int16=False)


class TestEngine:
    def test_synthesize_text(self, engine):
        out = engine.synthesize(text="[P]ni2 hao3[P]", speaker=0, seed=1)
        assert out["sampling_rate"] == 8000
        assert out["audio"].ndim == 1 and len(out["audio"]) > 0
        assert np.isfinite(out["audio"]).all()
        n = len(out["phones"])
        assert out["duration"].shape == (n,)
        assert out["f0"].shape == (n,)
        assert out["energy"].shape == (n,)
        # audio length = Σduration frames × hop
        assert len(out["audio"]) == int(out["duration"].sum()) * HOP

    def test_scalar_controls(self, engine):
        base = engine.synthesize(text="[P]ni2 hao3[P]", seed=1)
        slow = engine.synthesize(text="[P]ni2 hao3[P]", duration_control=2.0, seed=1)
        assert slow["duration"].sum() > base["duration"].sum()

    def test_prosody_edit_loop(self, engine):
        """GUI contract: take predicted per-phoneme f0, edit, re-synthesize."""
        first = engine.synthesize(text="[P]ni2 hao3[P]", seed=1)
        edited_f0 = np.asarray(first["f0"]) * 1.5
        second = engine.synthesize(
            text="[P]ni2 hao3[P]",
            pitch_control=edited_f0,
            duration_control=np.asarray(first["duration"]),
            seed=1,
        )
        np.testing.assert_allclose(
            second["f0"], edited_f0, rtol=2e-2, atol=1.0
        )
        assert second["duration"].sum() == first["duration"].sum()

    def test_speaker_by_name(self, engine):
        durs = np.full(4, 5.0)  # pin durations so lengths match across speakers
        a = engine.synthesize(text="[P]ni2 hao3[P]", speaker="alice",
                              duration_control=durs, seed=1)
        b = engine.synthesize(text="[P]ni2 hao3[P]", speaker="bob",
                              duration_control=durs, seed=1)
        assert a["audio"].shape == b["audio"].shape
        assert not np.allclose(a["audio"], b["audio"])

    def test_voice_conversion(self, engine):
        wav = np.random.RandomState(0).randn(HOP * 50).astype(np.float32) * 0.1
        out = engine.voice_conversion(wav, speaker_src=1, speaker_tgt=2)
        assert len(out["audio"]) == 50 * HOP
        assert np.isfinite(out["audio"]).all()


class TestServer:
    @pytest.fixture(scope="class")
    def server(self, engine):
        import socket

        from vispeech_tpu.infer.server import make_handler
        from http.server import ThreadingHTTPServer

        lock = threading.Lock()
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine, lock))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        httpd.shutdown()

    def test_health(self, server):
        with urllib.request.urlopen(f"{server}/health") as r:
            assert json.loads(r.read())["ok"] is True

    def test_tts_wav(self, server):
        from urllib.parse import quote

        with urllib.request.urlopen(f"{server}/tts?text={quote('[P]ni2 hao3[P]')}") as r:
            body = r.read()
        assert r.headers["Content-Type"] == "audio/wav"
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert len(body) > 100

    def test_tts_output_rate_conversion(self, server):
        """`sr` query param resamples the response (reference delivers
        22.05 kHz from the 44.1 kHz model via ffmpeg, inference_api.py:66-67)."""
        import struct
        import urllib.error
        from urllib.parse import quote

        with urllib.request.urlopen(
            f"{server}/tts?text={quote('[P]ni2 hao3[P]')}&sr=4000"
        ) as r:
            body = r.read()
        assert body[:4] == b"RIFF"
        # WAV fmt chunk sample rate at byte 24
        assert struct.unpack("<I", body[24:28])[0] == 4000
        # bad sr -> 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                f"{server}/tts?text={quote('[P]ni2 hao3[P]')}&sr=0"
            )
        assert exc.value.code == 400

    def test_tts_json_prosody(self, server):
        from urllib.parse import quote

        with urllib.request.urlopen(
            f"{server}/tts.json?text={quote('[P]ni2 hao3[P]')}&speaker=1"
        ) as r:
            obj = json.loads(r.read())
        assert obj["phones"]
        assert len(obj["f0"]) == len(obj["phones"])

    def test_frontend_failure_is_400(self, server):
        """Text the frontend can't phonemize (en without g2p_en/lexicon) is a
        client error, not a 500."""
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{server}/tts?text=abcxyz")
        assert exc.value.code == 400
        assert "frontend" in json.loads(exc.value.read())["error"]

    def test_gui_page(self, server):
        with urllib.request.urlopen(f"{server}/") as r:
            body = r.read().decode()
        assert "prosody editor" in body
        assert r.headers["Content-Type"].startswith("text/html")

    def test_post_tts_array_controls(self, server):
        """The web GUI's edit loop: get prosody, POST edited arrays back."""
        from urllib.parse import quote

        with urllib.request.urlopen(
            f"{server}/tts.json?text={quote('[P]ni2 hao3[P]')}"
        ) as r:
            prosody = json.loads(r.read())
        body = json.dumps({
            "phones": prosody["phones"],
            "speaker": 0,
            "pitch": [f * 1.2 for f in prosody["f0"]],
            "duration": prosody["duration"],
            "energy": prosody["energy"],
        }).encode()
        req = urllib.request.Request(
            f"{server}/tts", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as r:
            wav = r.read()
        assert wav[:4] == b"RIFF"
        # duration array respected: samples = Σdur × hop (+ WAV header 44B)
        n_samples = int(sum(prosody["duration"])) * HOP
        assert len(wav) == 44 + 2 * n_samples

    def test_post_vc(self, server):
        import io
        import struct

        from scipy.io import wavfile

        wav = (np.random.RandomState(0).randn(HOP * 40) * 0.1 * 32767).astype(np.int16)
        buf = io.BytesIO()
        wavfile.write(buf, 8000, wav)
        req = urllib.request.Request(
            f"{server}/vc?src=1&tgt=2", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"}, method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = r.read()
        assert out[:4] == b"RIFF"
        n_samples = struct.unpack("<I", out[40:44])[0] // 2
        assert n_samples == 40 * HOP

    def test_post_vc_wrong_rate(self, server):
        import io
        import urllib.error

        from scipy.io import wavfile

        buf = io.BytesIO()
        wavfile.write(buf, 16000, np.zeros(1600, np.int16))
        req = urllib.request.Request(
            f"{server}/vc", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_post_bad_json(self, server):
        import urllib.error

        req = urllib.request.Request(
            f"{server}/tts", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_missing_text(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{server}/tts")
        assert ei.value.code == 400


class TestBatchPlanning:
    """Host-side tiered bucket planner (infer/batching.py)."""

    def test_every_request_planned_once(self):
        from vispeech_tpu.infer.batching import plan_batches

        frames = [100, 500, 505, 510, 515, 520, 900, 60] * 3
        plans = plan_batches(frames)
        seen = sorted(i for p in plans for i in p.indices)
        assert seen == list(range(len(frames)))

    def test_tier_greedy(self):
        from vispeech_tpu.infer.batching import plan_batches

        # 19 same-bucket requests with tiers (16, 8, 4): 16 + 4(1 dummy)
        plans = plan_batches([300] * 19, tiers=(16, 8, 4))
        assert [(p.tier, len(p.indices)) for p in plans] == [(16, 16), (4, 3)]
        assert plans[1].dummy_rows == 1

    def test_efficiency_beats_single_tier(self):
        from vispeech_tpu.infer.batching import plan_batches, plan_stats

        rng = np.random.RandomState(0)
        frames = np.clip(np.exp(rng.normal(6.2, 0.55, 256)), 48, 1400).astype(int)
        tiered = plan_stats(plan_batches(frames), frames)
        single = plan_stats(
            plan_batches(frames, buckets=(64, 128, 256, 384, 512, 640, 768,
                                          896, 1024, 1152, 1280, 1400),
                         tiers=(16,)),
            frames)
        assert tiered["padding_efficiency"] > single["padding_efficiency"]
        # round-5: the tier ladder reaches 1, so no batch carries dummy rows
        # and efficiency clears the >=0.85 VERDICT target (measured 0.94)
        assert tiered["dummy_rows"] == 0
        assert tiered["padding_efficiency"] >= 0.85

    def test_bucket_rounding_above_range(self):
        from vispeech_tpu.infer.batching import pick_bucket

        # above the table: 256-frame granule, not multiples of the last
        # bucket (1401 -> 1536, not 2800 with ~50% padding)
        assert pick_bucket(1401) == 1536
        assert pick_bucket(2800) == 2816


class TestSynthesizeBatch:
    def test_batch_matches_fields_and_order(self, engine):
        texts = ["[P]ni2 hao3[P]", "[P]ni2 hao3 ma5[P]", "[P]hao3[P]"]
        outs = engine.synthesize_batch(texts=texts, seed=3)
        assert len(outs) == 3
        for t, o in zip(texts, outs):
            assert o["sampling_rate"] == engine.cfg.data.sampling_rate
            assert o["audio"].ndim == 1 and len(o["audio"]) > 0
            assert len(o["phones"]) == len(o["duration"]) == len(o["f0"])
        # request order preserved: row 2 is the shortest text
        assert len(outs[2]["phones"]) < len(outs[0]["phones"])

    def test_batch_speakers_differ(self, engine):
        outs = engine.synthesize_batch(
            texts=["[P]ni2 hao3[P]"] * 2, speakers=["alice", "bob"], seed=0)
        assert not np.allclose(
            outs[0]["audio"][: min(len(outs[0]["audio"]), len(outs[1]["audio"]))],
            outs[1]["audio"][: min(len(outs[0]["audio"]), len(outs[1]["audio"]))],
        )


class TestInt16Transfer:
    """Device-side PCM quantization (TTSEngine.transfer_int16): halves the
    dominant host-transfer term; 'audio' stays float32 within 1 LSB."""

    def test_int16_matches_f32_within_quantization(self, engine):
        from vispeech_tpu.infer.pipeline import TTSEngine

        from vispeech_tpu.ops.policy import FLOAT32_XLA

        # same numerics policy as the reference engine: this test isolates
        # the int16 TRANSFER quantization, not the serving-policy dtype
        eng16 = TTSEngine(engine.cfg, engine.variables, policy=FLOAT32_XLA,
                          transfer_int16=True)
        ref = engine.synthesize(text="[P]ni2 hao3[P]", seed=1)
        out = eng16.synthesize(text="[P]ni2 hao3[P]", seed=1)
        assert out["audio_int16"].dtype == np.int16
        assert out["audio"].dtype == np.float32
        assert len(out["audio"]) == len(ref["audio"])
        # dequantized float within one quantization step of the exact path
        np.testing.assert_allclose(
            out["audio"], np.clip(ref["audio"], -1, 1), atol=1.01 / 32767)
        # prosody fields untouched by the transfer dtype
        np.testing.assert_allclose(out["f0"], ref["f0"], rtol=1e-6)

    def test_batch_int16_pipeline_matches(self, engine):
        from vispeech_tpu.infer.pipeline import TTSEngine

        from vispeech_tpu.ops.policy import FLOAT32_XLA

        # same numerics policy as the reference engine: this test isolates
        # the int16 TRANSFER quantization, not the serving-policy dtype
        eng16 = TTSEngine(engine.cfg, engine.variables, policy=FLOAT32_XLA,
                          transfer_int16=True)
        texts = ["[P]ni2 hao3[P]", "[P]ni2 hao3 ma5[P]", "[P]hao3[P]"]
        ref = engine.synthesize_batch(texts=texts, seed=3)
        outs = eng16.synthesize_batch(texts=texts, seed=3)
        assert len(outs) == len(ref)
        for o, r in zip(outs, ref):
            assert o["audio_int16"].dtype == np.int16
            assert len(o["audio"]) == len(r["audio"])
            np.testing.assert_allclose(
                o["audio"], np.clip(r["audio"], -1, 1), atol=1.01 / 32767)

    def test_wav_bytes_int16_passthrough(self):
        from vispeech_tpu.infer.server import wav_bytes

        pcm = np.asarray([0, 100, -32768, 32767], np.int16)
        body = wav_bytes(pcm, 8000)
        assert body[:4] == b"RIFF"
        assert np.array_equal(
            np.frombuffer(body[-8:], "<i2"), pcm)
