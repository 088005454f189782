"""Offline pipeline tests: TextGrid parsing, alignment refinement, pitch
tracking (numpy vs native), and the post_mfa → f0energy → merge → spk2id
tool chain end-to-end via their CLIs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 2.0
            text = "nihao"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 0.75
            text = "n"
        intervals [3]:
            xmin = 0.75
            xmax = 1.5
            text = "i2"
        intervals [4]:
            xmin = 1.6
            xmax = 2.0
            text = "h"
"""


class TestTextGrid:
    def test_long_format(self, tmp_path):
        from vispeech_tpu.data.textgrid import read_textgrid

        p = tmp_path / "a.TextGrid"
        p.write_text(LONG_TG)
        g = read_textgrid(str(p))
        assert g.end_time == 2.0
        tier = g.get_tier_by_name("phones")
        assert [iv.text for iv in tier.intervals] == ["sil", "n", "i2", "h"]
        assert tier.intervals[1].start_time == 0.25

    def test_short_format(self, tmp_path):
        from vispeech_tpu.data.textgrid import read_textgrid

        short = (
            'File type = "ooTextFile"\n"TextGrid"\n0\n1.0\n<exists>\n1\n'
            '"IntervalTier"\n"phones"\n0\n1.0\n2\n'
            '0\n0.5\n"a"\n0.5\n1.0\n"b"\n'
        )
        p = tmp_path / "b.TextGrid"
        p.write_text(short)
        g = read_textgrid(str(p))
        tier = g.get_tier_by_name("phones")
        assert [iv.text for iv in tier.intervals] == ["a", "b"]


class TestAlignment:
    def test_tier_to_alignment_gap_insertion(self, tmp_path):
        from vispeech_tpu.data.alignment import tier_to_alignment
        from vispeech_tpu.data.textgrid import read_textgrid

        p = tmp_path / "a.TextGrid"
        p.write_text(LONG_TG)
        tier = read_textgrid(str(p)).get_tier_by_name("phones")
        phones, durs = tier_to_alignment(tier, sr=44100, hop=512)
        # gap between 1.5 and 1.6 becomes sp
        assert phones == ["sil", "n", "i2", "sp", "h"]
        # Σdur is exactly the rounded total frame count
        assert sum(durs) == int(round(2.0 * 44100 / 512))
        assert all(d >= 0 for d in durs)

    def test_merge_duplicates(self):
        from vispeech_tpu.data.alignment import merge_duplicates

        p, d = merge_duplicates(["sp", "sp", "a", "b", "b", "b"], [1, 2, 3, 4, 5, 6])
        assert p == ["sp", "a", "b"]
        assert d == [3, 3, 15]

    def test_refine_silences(self):
        from vispeech_tpu.data.alignment import refine_alignment

        rng = np.random.default_rng(0)
        phones = ["sil", "a", "sp", "b", "spn"]
        durs = [5, 10, 10, 10, 8]
        out_p, out_d = refine_alignment(phones, durs, rng)
        assert out_d == durs
        assert out_p[0] == "sp"  # first silence always sp
        assert out_p[1] == "a" and out_p[3] == "b"
        assert out_p[2] in (",", "…", "sp")
        assert out_p[4] in ("sp", ".")

    def test_refine_from_labels(self):
        from vispeech_tpu.data.alignment import refine_from_labels

        phones = ["sp", "n", "i2", "sp", "h", "ao3", "sp"]
        label = "n i2 , h ao3 ."
        refined = refine_from_labels(phones, [1] * 7, label)
        assert refined == ["sp", "n", "i2", ",", "h", "ao3", "."]


class TestPitch:
    def make_signal(self, sr=44100, f0=220.0, sec=1.0):
        t = np.arange(int(sr * sec)) / sr
        sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 5))
        return sig + 0.001 * np.random.RandomState(0).randn(len(sig))

    def test_accuracy(self):
        from vispeech_tpu.dsp.pitch import pitch_ac_numpy

        sig = self.make_signal()
        f0 = pitch_ac_numpy(sig, 44100, 512 / 44100)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        assert abs(np.mean(voiced) - 220.0) < 3.0

    def test_unvoiced_silence(self):
        from vispeech_tpu.dsp.pitch import pitch_ac_numpy

        sig = 0.0001 * np.random.RandomState(0).randn(44100)
        f0 = pitch_ac_numpy(sig, 44100, 512 / 44100)
        assert (f0 == 0).mean() > 0.9

    @pytest.mark.skipif(
        not os.path.exists(os.path.join(REPO, "native", "build", "libvispeech_dsp.so")),
        reason="native library not built",
    )
    def test_native_matches_numpy(self):
        from vispeech_tpu.dsp.pitch import pitch_ac, pitch_ac_numpy

        sr = 44100
        t = np.arange(int(sr * 1.5)) / sr
        f_inst = 180 + 40 * np.sin(2 * np.pi * 2.5 * t)
        phase = 2 * np.pi * np.cumsum(f_inst) / sr
        sig = np.sin(phase) + 0.4 * np.sin(2 * phase)
        sig[: sr // 8] = 0
        a = pitch_ac_numpy(sig, sr, 512 / sr)
        b = pitch_ac(sig, sr, 512 / sr, backend="native")
        assert len(a) == len(b)
        assert np.isclose(a, b, rtol=1e-5, atol=1e-2).mean() > 0.99

    def test_interpolate_f0(self):
        from vispeech_tpu.dsp.pitch import interpolate_f0

        f0 = np.array([0, 0, 100, 0, 200, 0, 0])
        out = interpolate_f0(f0)
        np.testing.assert_allclose(out, [100, 100, 100, 150, 200, 200, 200])

    def test_phoneme_average(self):
        from vispeech_tpu.dsp.pitch import phoneme_average

        track = np.array([1.0, 2, 3, 4, 5, 6])
        out = phoneme_average(track, [2, 0, 3, 1])
        np.testing.assert_allclose(out, [1.5, 0.0, 4.0, 6.0])


class TestToolChain:
    """post_mfa → f0energy → merge_dataset → preprocess_config, via CLIs."""

    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("corpus")
        sr, hop = 44100, 512
        rng = np.random.RandomState(0)
        for spk in ("spkA", "spkB"):
            tg_dir = root / "mfa_temp" / "textgrids" / "zh" / spk
            wav_dir = root / "mfa_temp" / "wavs" / "zh" / spk
            tg_dir.mkdir(parents=True)
            wav_dir.mkdir(parents=True)
            for i in range(3):
                (tg_dir / f"u{i}.TextGrid").write_text(LONG_TG)
                n = int(2.0 * sr)
                t = np.arange(n) / sr
                sig = 0.3 * np.sin(2 * np.pi * 200 * t)
                sig += 0.01 * rng.randn(n)
                wavfile.write(
                    wav_dir / f"u{i}.wav", sr, (sig * 32767).astype(np.int16)
                )
        return root

    def run_tool(self, root, script, *args):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", script), *args],
            cwd=str(root), capture_output=True, text=True, check=True,
        )

    def test_full_chain(self, corpus):
        self.run_tool(corpus, "post_mfa.py", "--lang", "zh")
        dur = (corpus / "filelists" / "zh.dur").read_text().strip().splitlines()
        assert len(dur) == 6
        spk, utt, phones, durs = dur[0].split("|")
        assert sum(int(d) for d in durs.split()) == int(round(2.0 * 44100 / 512))

        self.run_tool(corpus, "f0energy.py", "--lang", "zh", "--move-wavs")
        lst = (corpus / "filelists" / "zh_train.list").read_text().strip().splitlines()
        assert len(lst) == 6
        parts = lst[0].split("|")
        assert len(parts) == 6
        f0_vals = [float(v) for v in parts[4].split()]
        # voiced signal at 200 Hz: phoneme means should be near 200
        assert any(abs(v - 200) < 10 for v in f0_vals)
        assert (corpus / "dataset" / "spkA" / "u0.wav").exists()
        assert not (corpus / "mfa_temp" / "wavs" / "zh" / "spkA" / "u0.wav").exists()

        self.run_tool(corpus, "merge_dataset.py", "--langs", "zh", "--val-per-spk", "1")
        train = (corpus / "filelists" / "train.list").read_text().strip().splitlines()
        val = (corpus / "filelists" / "val.list").read_text().strip().splitlines()
        assert len(train) == 4 and len(val) == 2

        cfg_dir = corpus / "configs"
        cfg_dir.mkdir()
        (cfg_dir / "config.json").write_text(json.dumps({"data": {}}))
        self.run_tool(corpus, "preprocess_config.py")
        cfg = json.loads((cfg_dir / "config.json").read_text())
        assert cfg["data"]["spk2id"] == {"spkA": 0, "spkB": 1}
