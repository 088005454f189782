"""STFT / mel spectrogram on device, parity with the reference pipeline.

Reference semantics being reproduced (mel_processing.py:51-112):
  * reflect-pad the waveform by (n_fft − hop)/2 on both sides, center=False
  * periodic Hann window of win_length
  * magnitude = sqrt(re² + im² + 1e-6)
  * mel = log(clamp(mel_basis @ |X|, min=1e-5))

TPU-first design: framing + windowed DFT are fused into a single matmul
(frames·[n_fft] × DFT[n_fft, 2·n_bins]) that runs on the MXU — there is no FFT
unit on TPU, and for n_fft=2048 the matmul-DFT is both exact and fast.  Framing
uses a zero-copy chunked reshape when hop | n_fft (true for 2048/512), falling
back to a gather otherwise.

Layout: waveforms [B, L] → spectrograms [B, T, n_bins] (time-major,
channels-last — the framework-wide layout; the reference uses [B, C, T]).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vispeech_tpu.dsp.mel import mel_filterbank


@lru_cache(maxsize=8)
def _dft_matrix(n_fft: int, win_length: int) -> np.ndarray:
    """[n_fft, 2*(n_fft//2+1)] windowed real-DFT matrix: X @ W = [re | im]."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    # periodic Hann, matching torch.hann_window(win_length)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:  # center-pad window to n_fft
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    wcos = np.cos(angle) * win[:, None]
    wsin = -np.sin(angle) * win[:, None]
    return np.concatenate([wcos, wsin], axis=1).astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] → [B, F, n_fft] frames starting at multiples of hop (center=False)."""
    B, L = y.shape
    n_frames = 1 + (L - n_fft) // hop
    if n_fft % hop == 0:
        # zero-copy chunked framing: frame f = chunks[f : f + n_fft//hop]
        ratio = n_fft // hop
        usable = (n_frames - 1) * hop + n_fft
        n_chunks = usable // hop
        chunks = y[:, : n_chunks * hop].reshape(B, n_chunks, hop)
        parts = [chunks[:, i : i + n_frames] for i in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[:, idx]


def spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    center: bool = False,
) -> jnp.ndarray:
    """Linear magnitude spectrogram [B, T, n_fft//2+1] of waveform [B, L].

    Reference: mel_processing.py:51-70 (spectrogram_torch).
    """
    del sampling_rate, center  # kept for signature parity; center is always False
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(y, n_fft, hop_length)  # [B, F, n_fft]
    dft = jnp.asarray(_dft_matrix(n_fft, win_length))
    spec = jnp.einsum(
        "bfn,nk->bfk", frames.astype(jnp.float32), dft,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_bins = n_fft // 2 + 1
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    return jnp.sqrt(re * re + im * im + 1e-6)


def spec_to_mel(
    spec: jnp.ndarray,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: Optional[float],
) -> jnp.ndarray:
    """[B, T, n_bins] linear spec → [B, T, n_mels] log-mel.

    Reference: mel_processing.py:73-82 (spec_to_mel_torch) —
    dynamic-range compression log(clamp(·, 1e-5)).
    """
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum(
        "btk,mk->btm", spec, basis, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float,
    fmax: Optional[float],
    center: bool = False,
) -> jnp.ndarray:
    """Waveform [B, L] → log-mel [B, T, n_mels] (reference mel_processing.py:85-112)."""
    spec = spectrogram(y, n_fft, sampling_rate, hop_length, win_length, center)
    return spec_to_mel(spec, n_fft, n_mels, sampling_rate, fmin, fmax)
