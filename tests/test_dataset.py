"""Data pipeline unit tests (reference data_utils.py:16-318 semantics)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from vispeech_tpu.config import DataConfig
from vispeech_tpu.data.dataset import (
    MAX_FRAMES,
    BucketSampler,
    FilelistDataset,
    collate,
)

HOP = 64


@pytest.fixture()
def cfg():
    return DataConfig(
        sampling_rate=8000, filter_length=256, hop_length=HOP, win_length=256,
        n_mel_channels=20, spk2id=(("s0", 0), ("s1", 1)),
    )


def write_corpus(tmp_path, cfg, durs_list):
    rng = np.random.RandomState(0)
    lines = []
    for i, durs in enumerate(durs_list):
        spk = f"s{i % 2}"
        os.makedirs(tmp_path / spk, exist_ok=True)
        n_frames = int(sum(durs))
        wav = (rng.randn(n_frames * HOP) * 0.1 * 32767).astype(np.int16)
        wavfile.write(tmp_path / spk / f"u{i}.wav", 8000, wav)
        n = len(durs)
        phones = " ".join(["n"] * n)
        f0 = " ".join(["200.0"] * n)
        en = " ".join(["60.0"] * n)
        lines.append(f"{spk}|u{i}|{phones}|{' '.join(map(str, durs))}|{f0}|{en}")
    fl = tmp_path / "train.list"
    fl.write_text("\n".join(lines) + "\n")
    return str(fl)


class TestFilelistDataset:
    def test_parse_and_length_filter(self, tmp_path, cfg):
        fl = write_corpus(tmp_path, cfg, [[4, 4], [MAX_FRAMES + 1], [2, 3, 4]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        # the >1400-frame utterance is dropped (data_utils.py:52-56)
        assert len(ds) == 2
        assert ds.lengths == [8, 9]
        assert ds.utterances[0].sid == 0
        assert ds.utterances[1].sid == 0  # u2 is s0 (i%2: u0→s0, u2→s0)

    def test_load_audio_crop_and_cache(self, tmp_path, cfg):
        fl = write_corpus(tmp_path, cfg, [[5, 5]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        spec, wav = ds.load_audio(ds.utterances[0])
        assert spec.shape[0] == 10          # exactly Σdur frames
        assert len(wav) == 10 * HOP
        # spec cache written next to the wav (.spec.npy, data_utils.py:113-124)
        cache = str(tmp_path / "s0" / "u0.spec.npy")
        assert os.path.exists(cache)
        spec2, _ = ds.load_audio(ds.utterances[0])
        np.testing.assert_array_equal(spec, spec2)


class TestBucketSampler:
    def test_epoch_determinism(self):
        lengths = list(np.random.RandomState(0).randint(10, 600, 50))
        s1 = BucketSampler(lengths, batch_size=4, seed=7)
        s2 = BucketSampler(lengths, batch_size=4, seed=7)
        s1.set_epoch(3)
        s2.set_epoch(3)
        assert list(s1) == list(s2)
        s2.set_epoch(4)
        assert list(s1) != list(s2)

    def test_wrap_to_multiple(self):
        # 5 items in one bucket, batch 4 → wraps to 8 → 2 batches
        lengths = [100] * 5
        s = BucketSampler(lengths, batch_size=4, shuffle=False)
        batches = list(s)
        assert len(batches) == 2
        seen = [i for _, idxs in batches for i in idxs]
        assert len(seen) == 8
        assert set(seen) == {0, 1, 2, 3, 4}

    def test_rank_striding_partitions(self):
        lengths = [100] * 16
        all_idx = []
        for rank in range(2):
            s = BucketSampler(lengths, batch_size=4, num_replicas=2, rank=rank,
                              shuffle=False)
            all_idx += [i for _, idxs in s for i in idxs]
        assert sorted(all_idx) == list(range(16))

    def test_bucket_assignment(self):
        s = BucketSampler([30, 100, 1300], batch_size=1, shuffle=False)
        batches = list(s)
        buckets = sorted(b for b, _ in batches)
        assert len(batches) == 3
        assert len(set(buckets)) == 3  # three different buckets


class TestCollate:
    def test_static_shapes(self, tmp_path, cfg):
        fl = write_corpus(tmp_path, cfg, [[4, 4], [2, 3, 4], [6]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        out = collate(ds, [0, 1, 2], frame_budget=64)
        assert out["spec"].shape == (3, 64, cfg.spec_channels)
        assert out["wav"].shape == (3, 64 * HOP, 1)
        assert out["phonemes"].shape[1] % 32 == 0
        np.testing.assert_array_equal(out["spec_lengths"], [8, 9, 6])
        # padding regions are zero
        assert out["spec"][0, 8:].sum() == 0
        assert out["wav"][2, 6 * HOP:].sum() == 0


class TestPhonemeBudgets:
    def test_one_shape_per_bucket(self, tmp_path, cfg):
        """Per-bucket static phoneme pads: every batch a bucket serves has
        the same (T, N) shape regardless of which utterances land in it."""
        from vispeech_tpu.data.dataset import bucket_phoneme_budgets, data_loader

        # bucket 0 (<=64 frames): utts with 2 and 40 phonemes; batch_size=1
        # would otherwise produce N=32 and N=64 batches from one bucket
        fl = write_corpus(tmp_path, cfg, [[20, 20], [1] * 40, [30, 30]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        s = BucketSampler(ds.lengths, batch_size=1, shuffle=False)
        budgets = bucket_phoneme_budgets(ds, s)
        assert budgets == {0: 64}  # max(2, 40, 2) phonemes -> round up 32
        shapes = set()
        for raw in data_loader(ds, s, epoch=0, phoneme_budgets=budgets):
            shapes.add((raw["spec"].shape[1], raw["phonemes"].shape[1]))
        assert shapes == {(64, 64)}

    def test_budget_never_truncates(self, tmp_path, cfg):
        from vispeech_tpu.data.dataset import collate

        fl = write_corpus(tmp_path, cfg, [[1] * 40])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        out = collate(ds, [0], frame_budget=64, phoneme_budget=32)
        assert out["phonemes"].shape[1] == 64  # actual max wins over budget


class TestLoaderFailures:
    def test_prefetch_error_propagates(self, tmp_path, cfg):
        """A bad utterance fails the loader loudly instead of silently
        ending the epoch (found by a silent 1-batch epoch in round 4)."""
        from vispeech_tpu.data.dataset import data_loader

        fl = write_corpus(tmp_path, cfg, [[20, 20], [10, 10]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        # corrupt u1's wav to half its length -> Σdur mismatch at load
        p = tmp_path / "s1" / "u1.wav"
        sr, data = __import__("scipy.io", fromlist=["wavfile"]).wavfile.read(str(p))
        wavfile.write(str(p), sr, data[: len(data) // 2])
        s = BucketSampler(ds.lengths, batch_size=1, shuffle=False)
        with pytest.raises(AssertionError):
            for _ in data_loader(ds, s, epoch=0):
                pass

    def test_stale_spec_cache_recomputed(self, tmp_path, cfg):
        """A .spec.npy whose frame count mismatches Σdur (wav replaced
        underneath it) is recomputed, not trusted."""
        fl = write_corpus(tmp_path, cfg, [[20, 20]])
        ds = FilelistDataset(fl, cfg, data_root=str(tmp_path))
        u = ds.utterances[0]
        np.save(u.wav_path.replace(".wav", ".spec.npy"),
                np.zeros((7, cfg.spec_channels), np.float32))  # stale: 7 != 40
        spec, wav = ds.load_audio(u)
        assert spec.shape[0] == 40
        assert np.abs(spec).sum() > 0  # fresh spec, not the zero stale one
