"""Filelist dataset, length-bucketed batching, and host prefetch.

Behavioral contract from the reference (data_utils.py:16-318):
  * filelist line: ``spk|id|phones|durations|f0|energy`` (space-separated
    fields), wavs at ``dataset/{spk}/{id}.wav`` (44.1 kHz, 16-bit)
  * utterances longer than 1400 frames are dropped (data_utils.py:52-56)
  * linear spectrograms are computed once and cached next to the wav
    (``.spec.npy`` here vs the reference's ``.spec.pt``, data_utils.py:113-124)
  * spec/wav are padded/cropped to exactly Σduration frames (within a
    2-frame tolerance assert, data_utils.py:78-91)
  * epoch-seeded shuffling, rank-strided sharding, and wrap-to-multiple
    batching reproduce DistributedBucketSampler (data_utils.py:219-318)

TPU-first redesign: batches are padded to *bucketed static shapes* — frame
length rounds up to a bucket boundary and phoneme length to a fixed multiple —
so XLA compiles a bounded number of programs instead of one per shape
(SURVEY.md §7.6).
"""

from __future__ import annotations

import os
import queue
import threading
from bisect import bisect_left
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from vispeech_tpu.config import DataConfig
from vispeech_tpu.dsp.stft import _dft_matrix
from vispeech_tpu.text import cleaned_text_to_sequence

MAX_FRAMES = 1400  # reference data_utils.py:54

# frame-length bucket upper bounds (reference train.py:71 boundaries)
DEFAULT_BUCKETS = (64, 128, 256, 384, 512, 640, 768, 896, 1024, 1152, 1280, 1400)
PHONEME_PAD_MULTIPLE = 32


@dataclass
class Utterance:
    wav_path: str
    speaker: str
    utt_id: str
    sid: int
    phonemes: np.ndarray  # [N] int32
    duration: np.ndarray  # [N] int32
    f0: np.ndarray        # [N] float32
    energy: np.ndarray    # [N] float32
    n_frames: int


def parse_filelist_line(line: str, spk2id) -> Optional[Tuple]:
    parts = line.rstrip("\n").split("|")
    if len(parts) != 6:
        return None
    spk, utt_id, phones, durs, f0, energy = parts
    return spk, utt_id, phones, durs, f0, energy


def numpy_spectrogram(
    audio: np.ndarray, n_fft: int, hop: int, win: int
) -> np.ndarray:
    """Host-side linear spectrogram, same semantics as dsp.spectrogram
    (reflect pad (n_fft−hop)/2, hann, √(|X|²+1e-6)) → [T, n_bins] float32."""
    pad = (n_fft - hop) // 2
    y = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx]
    dft = _dft_matrix(n_fft, win).astype(np.float64)
    spec = frames @ dft
    n_bins = n_fft // 2 + 1
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    return np.sqrt(re * re + im * im + 1e-6).astype(np.float32)


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    return data, sr


class FilelistDataset:
    """Parses the filelist, lazily loads wav+spec per utterance."""

    def __init__(
        self,
        filelist_path: str,
        cfg: DataConfig,
        data_root: str = "dataset",
        cache_spec: bool = True,
        max_frames: int = MAX_FRAMES,
    ):
        self.cfg = cfg
        self.data_root = data_root
        self.cache_spec = cache_spec
        spk2id = dict(cfg.spk2id)
        self.utterances: List[Utterance] = []
        with open(filelist_path, "r", encoding="utf-8") as f:
            for line in f:
                parsed = parse_filelist_line(line, spk2id)
                if parsed is None:
                    continue
                spk, utt_id, phones, durs, f0, energy = parsed
                duration = np.array([int(i) for i in durs.split(" ")], np.int32)
                n_frames = int(duration.sum())
                if n_frames > max_frames:
                    continue
                self.utterances.append(
                    Utterance(
                        wav_path=os.path.join(self.data_root, spk, f"{utt_id}.wav"),
                        speaker=spk,
                        utt_id=utt_id,
                        sid=spk2id.get(spk, 0),
                        phonemes=np.array(
                            cleaned_text_to_sequence(phones.split(" ")), np.int32
                        ),
                        duration=duration,
                        f0=np.array([float(i) for i in f0.split(" ")], np.float32),
                        energy=np.array([float(i) for i in energy.split(" ")], np.float32),
                        n_frames=n_frames,
                    )
                )

    def __len__(self) -> int:
        return len(self.utterances)

    @property
    def lengths(self) -> List[int]:
        return [u.n_frames for u in self.utterances]

    def load_audio(self, utt: Utterance) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (spec [T, n_bins], wav [T*hop]) cropped/padded to Σdur."""
        cfg = self.cfg
        data, sr = load_wav(utt.wav_path)
        if sr != cfg.sampling_rate:
            raise ValueError(f"{utt.wav_path}: {sr} != {cfg.sampling_rate}")
        audio = data.astype(np.float32) / cfg.max_wav_value

        spec_path = utt.wav_path.replace(".wav", ".spec.npy")
        spec = None
        if self.cache_spec and os.path.exists(spec_path):
            try:
                spec = np.load(spec_path)
            except Exception:
                spec = None
            # a stale cache (wav replaced since the spec was written) shows
            # up as a frame-count mismatch — recompute instead of asserting
            if spec is not None and abs(spec.shape[0] - utt.n_frames) >= 2:
                spec = None
        if spec is None:
            spec = numpy_spectrogram(
                audio, cfg.filter_length, cfg.hop_length, cfg.win_length
            )
            if self.cache_spec:
                try:
                    np.save(spec_path, spec)
                except OSError:
                    pass

        sumdur = utt.n_frames
        assert abs(spec.shape[0] - sumdur) < 2, utt.wav_path
        hop = cfg.hop_length
        return self._crop(spec, audio, sumdur, hop)

    def load_wav_int16(self, utt: Utterance) -> np.ndarray:
        """Raw int16 samples cropped/padded to exactly Σdur·hop — the
        device-DSP pipeline's input (no host spectrogram, no cache IO;
        the train step computes the spec on device, train/step.py)."""
        cfg = self.cfg
        data, sr = load_wav(utt.wav_path)
        if sr != cfg.sampling_rate:
            raise ValueError(f"{utt.wav_path}: {sr} != {cfg.sampling_rate}")
        if data.dtype != np.int16:
            # float/24-bit wavs must not be silently truncated to int16
            # (floats in [-1,1] would become all-zero samples); the host
            # load_audio path handles those — require 16-bit PCM here
            raise ValueError(
                f"{utt.wav_path}: device-DSP pipeline requires 16-bit PCM "
                f"wavs, got {data.dtype}")
        hop = cfg.hop_length
        n = utt.n_frames * hop
        # same ±2-frame tolerance the spec path enforces (data_utils.py:79)
        assert abs(len(data) - n) < 2 * hop, utt.wav_path
        data = np.asarray(data[:n], np.int16)
        if len(data) < n:
            data = np.pad(data, (0, n - len(data)))
        return data

    @staticmethod
    def _crop(spec, audio, sumdur, hop):
        if spec.shape[0] > sumdur:
            spec = spec[:sumdur]
            audio = audio[: sumdur * hop]
        elif spec.shape[0] < sumdur:
            spec = np.pad(spec, ((0, sumdur - spec.shape[0]), (0, 0)))
        if len(audio) < sumdur * hop:
            audio = np.pad(audio, (0, sumdur * hop - len(audio)))
        else:
            audio = audio[: sumdur * hop]
        return spec, audio


class BucketSampler:
    """Length-bucketed, epoch-seeded, rank-strided batch sampler.

    Reproduces DistributedBucketSampler semantics (data_utils.py:219-318):
    each bucket's index list is padded by wrapping so every rank gets the
    same number of whole batches; shuffling is deterministic in (seed, epoch).
    """

    def __init__(
        self,
        lengths: Sequence[int],
        batch_size: int,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 1234,
    ):
        self.batch_size = batch_size
        self.buckets = list(buckets)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.bucket_indices: List[List[int]] = [[] for _ in self.buckets]
        for i, length in enumerate(lengths):
            b = bisect_left(self.buckets, length)
            if b < len(self.buckets):
                self.bucket_indices[b].append(i)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Tuple[int, List[int]]]:
        """Yields (bucket_id, indices) batches for this rank."""
        g = np.random.RandomState(self.seed + self.epoch)
        per_step = self.batch_size * self.num_replicas
        all_batches = []
        for b, idxs in enumerate(self.bucket_indices):
            if not idxs:
                continue
            idxs = list(idxs)
            if self.shuffle:
                idxs = [idxs[i] for i in g.permutation(len(idxs))]
            rem = (-len(idxs)) % per_step
            idxs = idxs + idxs[: rem]  # wrap to a multiple (reference behavior)
            mine = idxs[self.rank :: self.num_replicas]
            for s in range(0, len(mine), self.batch_size):
                all_batches.append((b, mine[s : s + self.batch_size]))
        if self.shuffle:
            order = g.permutation(len(all_batches))
            all_batches = [all_batches[i] for i in order]
        return iter(all_batches)

    def __len__(self) -> int:
        per_step = self.batch_size * self.num_replicas
        total = 0
        for idxs in self.bucket_indices:
            if idxs:
                padded = len(idxs) + ((-len(idxs)) % per_step)
                total += padded // per_step
        return total


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_phoneme_budgets(
    dataset: FilelistDataset,
    sampler: "BucketSampler",
    phoneme_pad_multiple: int = PHONEME_PAD_MULTIPLE,
) -> dict:
    """Static per-bucket phoneme pad: the max phoneme count over every
    utterance the bucket can ever serve, rounded up to the pad multiple.

    With this, each frame bucket maps to exactly ONE (T, N) batch shape, so
    the jitted train step compiles at most once per non-empty bucket instead
    of once per (bucket, batch-max-phonemes) combination — the per-batch
    round-up can draw a different N almost every batch at production scale
    (a recompile storm on a multi-minute-compile program).
    """
    budgets = {}
    for b, idxs in enumerate(sampler.bucket_indices):
        if idxs:
            budgets[b] = _round_up(
                max(len(dataset.utterances[i].phonemes) for i in idxs),
                phoneme_pad_multiple,
            )
    return budgets


def collate(
    dataset: FilelistDataset,
    indices: Sequence[int],
    frame_budget: int,
    phoneme_pad_multiple: int = PHONEME_PAD_MULTIPLE,
    phoneme_budget: Optional[int] = None,
    device_dsp: bool = False,
):
    """Assemble one padded batch with static shapes.

    Frames pad to `frame_budget` (the bucket bound), phonemes to
    `phoneme_budget` when given (per-bucket static shape, see
    bucket_phoneme_budgets) else to the next multiple of
    `phoneme_pad_multiple` — bounded compile count.
    Returns a dict of numpy arrays matching train.step.Batch fields.

    ``device_dsp=True`` (cfg.train.device_dsp): no host spectrogram at all —
    ``spec`` is None and ``wav`` is int16; the train step computes the spec
    on device.  ~6× less host→device traffic (the f32 spec dominates) and
    no DFT/cache work on the host.
    """
    cfg = dataset.cfg
    utts = [dataset.utterances[i] for i in indices]
    B = len(utts)
    n_ph = _round_up(max(len(u.phonemes) for u in utts), phoneme_pad_multiple)
    if phoneme_budget is not None:
        n_ph = max(n_ph, phoneme_budget)
    T = frame_budget
    hop = cfg.hop_length

    phonemes = np.zeros((B, n_ph), np.int32)
    f0 = np.zeros((B, n_ph), np.float32)
    energy = np.zeros((B, n_ph), np.float32)
    duration = np.zeros((B, n_ph), np.int32)
    ph_lengths = np.zeros(B, np.int32)
    spec = (None if device_dsp
            else np.zeros((B, T, cfg.spec_channels), np.float32))
    wav = np.zeros((B, T * hop, 1), np.int16 if device_dsp else np.float32)
    spec_lengths = np.zeros(B, np.int32)
    wav_lengths = np.zeros(B, np.int32)
    sid = np.zeros(B, np.int32)

    for i, u in enumerate(utts):
        n = len(u.phonemes)
        phonemes[i, :n] = u.phonemes
        f0[i, :n] = u.f0
        energy[i, :n] = u.energy
        duration[i, :n] = u.duration
        ph_lengths[i] = n
        if device_dsp:
            a16 = dataset.load_wav_int16(u)
            t = u.n_frames
            wav[i, : t * hop, 0] = a16
        else:
            s, a = dataset.load_audio(u)
            t = s.shape[0]
            spec[i, :t] = s
            wav[i, : t * hop, 0] = a
        spec_lengths[i] = t
        wav_lengths[i] = t * hop
        sid[i] = u.sid

    return dict(
        phonemes=phonemes,
        phoneme_lengths=ph_lengths,
        f0=f0,
        energy=energy,
        duration=duration,
        spec=spec,
        spec_lengths=spec_lengths,
        wav=wav,
        wav_lengths=wav_lengths,
        sid=sid,
    )


def data_loader(
    dataset: FilelistDataset,
    sampler: BucketSampler,
    epoch: int,
    prefetch: int = 4,
    phoneme_budgets: Optional[dict] = None,
    device_dsp: bool = False,
) -> Iterator[dict]:
    """Background-thread prefetching iterator over collated numpy batches.

    `phoneme_budgets` (bucket_id → static phoneme pad, from
    bucket_phoneme_budgets) pins each bucket to one batch shape."""
    sampler.set_epoch(epoch)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    sentinel = object()
    failure: list = []

    def worker():
        try:
            for bucket_id, indices in sampler:
                q.put(collate(
                    dataset, indices, sampler.buckets[bucket_id],
                    phoneme_budget=(phoneme_budgets or {}).get(bucket_id),
                    device_dsp=device_dsp,
                ))
        except BaseException as e:  # re-raised on the consumer thread below
            failure.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            # a prefetch failure must fail the training loop, not silently
            # truncate the epoch (bad utterances would otherwise just
            # vanish from training with no signal)
            if failure:
                raise failure[0]
            break
        yield item
