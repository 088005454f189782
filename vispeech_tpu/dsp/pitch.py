"""Pitch (F0) and energy extraction for the offline data pipeline.

Replaces the reference's native dependencies (parselmouth/Praat C++ for F0,
librosa for energy — f0energy.py:11-60) with an in-repo implementation of
Boersma's autocorrelation pitch algorithm (the same algorithm Praat's
``to_pitch_ac`` uses): per-frame windowed autocorrelation via FFT, normalized
by the window autocorrelation, candidate peak picking, and Viterbi path
selection with octave / voicing transition costs.

Two backends:
  * ``native/`` C++ core (``libvispeech_dsp.so``) via ctypes — the production
    path, ~10× the numpy speed on long corpora;
  * pure-numpy fallback with identical semantics (used in tests and when the
    native library is not built).

Reference behavioral contract (f0energy.py):
  * time_step = hop/sr, floor 80 Hz, ceiling 750 Hz, voicing threshold 0.6
  * unvoiced frames are 0 (``selected_array['frequency']``)
  * the wrapper pads 2 frames left so frame i aligns with spectrogram frame i
  * energy = L2 magnitude norm per frame of an n_fft=1280 centered STFT —
    the reference's 1280 ≠ the model's 2048 quirk is kept (f0energy.py:14)
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

# Praat default costs (Boersma 1993); voicing_threshold comes from the caller
SILENCE_THRESHOLD = 0.03
OCTAVE_COST = 0.01
OCTAVE_JUMP_COST = 0.35
VOICED_UNVOICED_COST = 0.14
MAX_CANDIDATES = 15
PERIODS_PER_WINDOW = 3.0


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass
class PitchFrames:
    """Frame layout of the analysis (Praat-compatible centering)."""

    n_frames: int
    t1: float  # center time of the first frame (seconds)
    dt: float


def frame_layout(n_samples: int, sr: float, time_step: float, window_sec: float) -> PitchFrames:
    """Praat centers an integral number of frames inside the signal."""
    duration = n_samples / sr
    n_frames = max(0, int(np.floor((duration - window_sec) / time_step)) + 1)
    mid = duration / 2.0
    t1 = mid - ((n_frames - 1) * time_step) / 2.0
    return PitchFrames(n_frames, t1, time_step)


def _frame_matrix(x: np.ndarray, sr: float, layout: PitchFrames, wlen: int) -> np.ndarray:
    """[n_frames, wlen] windowed-segment matrix (centered frames)."""
    centers = (layout.t1 + np.arange(layout.n_frames) * layout.dt) * sr
    starts = np.round(centers - wlen / 2.0).astype(np.int64)
    starts = np.clip(starts, 0, max(len(x) - wlen, 0))
    idx = starts[:, None] + np.arange(wlen)[None, :]
    return x[idx]


def pitch_ac_numpy(
    x: np.ndarray,
    sr: float,
    time_step: float,
    pitch_floor: float = 80.0,
    pitch_ceiling: float = 750.0,
    voicing_threshold: float = 0.6,
    silence_threshold: float = SILENCE_THRESHOLD,
    octave_cost: float = OCTAVE_COST,
    octave_jump_cost: float = OCTAVE_JUMP_COST,
    voiced_unvoiced_cost: float = VOICED_UNVOICED_COST,
) -> np.ndarray:
    """F0 per frame (0 = unvoiced). Pure-numpy Boersma AC implementation."""
    x = np.asarray(x, np.float64)
    window_sec = PERIODS_PER_WINDOW / pitch_floor
    wlen = int(round(window_sec * sr))
    layout = frame_layout(len(x), sr, time_step, window_sec)
    if layout.n_frames <= 0:
        return np.zeros(0, np.float64)

    global_peak = np.max(np.abs(x - np.mean(x))) + 1e-30

    frames = _frame_matrix(x, sr, layout, wlen)
    frames = frames - frames.mean(axis=1, keepdims=True)
    local_peak = np.max(np.abs(frames), axis=1)

    window = np.hanning(wlen)
    fw = frames * window[None, :]

    nfft = _next_pow2(int(wlen * 1.5))
    # normalized autocorrelation of each windowed frame
    spec = np.fft.rfft(fw, nfft, axis=1)
    ac = np.fft.irfft(spec * np.conj(spec), nfft, axis=1)[:, : wlen]
    r0 = ac[:, 0:1] + 1e-30
    rx = ac / r0
    # divide out the window's own autocorrelation
    wspec = np.fft.rfft(window, nfft)
    wac = np.fft.irfft(wspec * np.conj(wspec), nfft)[:wlen]
    wac = wac / (wac[0] + 1e-30)
    valid = wac > 1e-6
    r = np.where(valid[None, :], rx / np.where(valid, wac, 1.0)[None, :], 0.0)

    lag_min = max(2, int(np.floor(sr / pitch_ceiling)))
    lag_max = min(wlen - 2, int(np.ceil(sr / pitch_floor)))

    n = layout.n_frames
    cand_freq = np.zeros((n, MAX_CANDIDATES), np.float64)   # 0 = unvoiced cand
    cand_str = np.full((n, MAX_CANDIDATES), -1e30, np.float64)

    # unvoiced candidate strength (Boersma eq. 23)
    intensity = local_peak / global_peak
    cand_str[:, 0] = voicing_threshold + np.maximum(
        0.0, 2.0 - (intensity / (silence_threshold / (1.0 + voicing_threshold)))
    )

    for i in range(n):
        ri = r[i]
        k = 1
        # local maxima in the allowed lag range, strongest first
        seg = ri[lag_min : lag_max + 1]
        maxima = np.where((seg[1:-1] > seg[:-2]) & (seg[1:-1] >= seg[2:]))[0] + 1
        if maxima.size:
            order = np.argsort(seg[maxima])[::-1]
            for m in maxima[order][: MAX_CANDIDATES - 1]:
                lag = lag_min + m
                # parabolic interpolation of the peak
                y0, y1, y2 = ri[lag - 1], ri[lag], ri[lag + 1]
                denom = y0 - 2 * y1 + y2
                delta = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
                lag_i = lag + np.clip(delta, -1, 1)
                strength = y1 - 0.25 * (y0 - y2) * np.clip(delta, -1, 1)
                f = sr / lag_i
                if f < pitch_floor or f > pitch_ceiling:
                    continue
                strength = min(strength, 1.0)
                cand_freq[i, k] = f
                cand_str[i, k] = strength - octave_cost * np.log2(
                    pitch_ceiling / f
                )
                k += 1

    # Viterbi over candidates (transition costs per Boersma §4)
    cost_scale = time_step / 0.01  # praat defines costs per 10 ms
    delta = cand_str[0].copy()
    back = np.zeros((n, MAX_CANDIDATES), np.int32)
    for i in range(1, n):
        fprev = cand_freq[i - 1][:, None]
        fcur = cand_freq[i][None, :]
        both_v = (fprev > 0) & (fcur > 0)
        trans = np.where(
            both_v,
            octave_jump_cost * cost_scale
            * np.abs(np.log2(np.maximum(fprev, 1e-9) / np.maximum(fcur, 1e-9))),
            np.where(
                (fprev > 0) != (fcur > 0),
                voiced_unvoiced_cost * cost_scale,
                0.0,
            ),
        )
        total = delta[:, None] - trans + cand_str[i][None, :]
        back[i] = np.argmax(total, axis=0)
        delta = np.max(total, axis=0)

    path = np.zeros(n, np.int32)
    path[-1] = int(np.argmax(delta))
    for i in range(n - 2, -1, -1):
        path[i] = back[i + 1, path[i + 1]]
    return cand_freq[np.arange(n), path]


# --------------------------------------------------------------- native hook

_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "build", "libvispeech_dsp.so"),
        os.path.join(here, "native", "libvispeech_dsp.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.pitch_ac.restype = ctypes.c_int
                lib.pitch_ac.argtypes = [
                    ctypes.POINTER(ctypes.c_double), ctypes.c_long,   # x, n
                    ctypes.c_double, ctypes.c_double,                 # sr, time_step
                    ctypes.c_double, ctypes.c_double, ctypes.c_double,  # floor, ceil, voicing
                    ctypes.POINTER(ctypes.c_double), ctypes.c_long,   # out, max_frames
                ]
                _native = lib
                return lib
            except OSError:
                pass
    _native = False
    return False


def pitch_ac(
    x: np.ndarray,
    sr: float,
    time_step: float,
    pitch_floor: float = 80.0,
    pitch_ceiling: float = 750.0,
    voicing_threshold: float = 0.6,
    backend: str = "auto",
) -> np.ndarray:
    """Dispatch to the C++ core when built, else numpy (identical output)."""
    if backend in ("auto", "native"):
        lib = _load_native()
        if lib:
            x64 = np.ascontiguousarray(x, np.float64)
            window_sec = PERIODS_PER_WINDOW / pitch_floor
            layout = frame_layout(len(x64), sr, time_step, window_sec)
            out = np.zeros(max(layout.n_frames, 1), np.float64)
            n = lib.pitch_ac(
                x64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x64),
                float(sr), float(time_step),
                float(pitch_floor), float(pitch_ceiling), float(voicing_threshold),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(out),
            )
            if n >= 0:
                return out[:n]
        if backend == "native":
            raise RuntimeError("native DSP library not built (run make -C native)")
    return pitch_ac_numpy(
        x, sr, time_step, pitch_floor, pitch_ceiling, voicing_threshold
    )


# ----------------------------------------------------------------- wrappers


def extract_f0(
    wav: np.ndarray,
    sr: int,
    hop_length: int,
    n_frames: int,
    pitch_floor: float = 80.0,
    pitch_ceiling: float = 750.0,
    voicing_threshold: float = 0.6,
    backend: str = "auto",
) -> np.ndarray:
    """Frame-aligned F0 track of length `n_frames` (reference get_pitch,
    f0energy.py:35-60: lpad 2, rpad 0..2, zeros elsewhere)."""
    f0 = pitch_ac(
        wav, sr, hop_length / sr, pitch_floor, pitch_ceiling,
        voicing_threshold, backend=backend,
    )
    lpad = 2
    rpad = n_frames - len(f0) - lpad
    if rpad < 0:
        f0 = f0[: n_frames - lpad]
        rpad = 0
    return np.pad(f0, (lpad, rpad))


def interpolate_f0(f0: np.ndarray) -> np.ndarray:
    """Linear interpolation across unvoiced (zero) gaps, edge-extended
    (reference f0energy.py:78-88)."""
    f0 = np.asarray(f0, np.float64).copy()
    nz = np.flatnonzero(f0 != 0)
    if nz.size == 0:
        return f0
    f0 = np.interp(np.arange(len(f0)), nz, f0[nz])
    return f0


def frame_energy(
    wav: np.ndarray, n_frames: int, n_fft: int = 1280, hop_length: int = 512
) -> np.ndarray:
    """Per-frame spectral L2 energy (reference rawenergy, f0energy.py:19-32:
    centered STFT with n_fft 1280 — intentionally ≠ the model's 2048)."""
    x = np.asarray(wav, np.float64)
    pad = n_fft // 2
    y = np.pad(x, (pad, pad), mode="reflect")
    n = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = y[idx] * np.hanning(n_fft)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    e = np.sqrt(np.sum(mag * mag, axis=1))
    assert abs(len(e) - n_frames) < 2, (len(e), n_frames)
    if len(e) < n_frames:
        e = np.pad(e, (0, n_frames - len(e)))
    return e[:n_frames]


F0_BIN = 256
F0_MIN, F0_MAX = 50.0, 1100.0
_F0_MEL_MIN = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
_F0_MEL_MAX = 1127.0 * np.log(1.0 + F0_MAX / 700.0)


def f0_to_coarse(f0: np.ndarray) -> np.ndarray:
    """256-bin mel-scale F0 quantizer (reference utils.py:262-278; bin 1 =
    unvoiced/low, bins 1..255).  torch note: torch's (x+0.5).long() truncates
    while np.rint rounds half-to-even — we keep the numpy behavior."""
    f0 = np.asarray(f0, np.float64)
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - _F0_MEL_MIN) * (F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN) + 1
    f0_mel = np.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = np.clip(f0_mel, 1, F0_BIN - 1)
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= 255 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def phoneme_average(track: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Mean of a frame-level track over each phoneme's duration span
    (reference f0energy.py:89-109); zero-duration phonemes get 0."""
    durations = np.asarray(durations, np.int64)
    out = np.zeros(len(durations), np.float64)
    pos = 0
    for i, d in enumerate(durations):
        if d > 0:
            out[i] = float(np.mean(track[pos : pos + d]))
        pos += d
    return out
