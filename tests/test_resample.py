"""Output-rate conversion (dsp/resample.py)."""

import numpy as np

from vispeech_tpu.dsp.resample import resample


def test_identity():
    w = np.random.RandomState(0).randn(1000).astype(np.float32)
    assert resample(w, 44100, 44100) is w


def test_halving_preserves_tone():
    sr, sr2 = 44100, 22050
    t = np.arange(sr) / sr
    w = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(w, sr, sr2)
    assert abs(len(y) - sr2) <= 2
    # dominant bin stays at 440 Hz
    spec = np.abs(np.fft.rfft(y))
    freq = np.fft.rfftfreq(len(y), 1 / sr2)
    assert abs(freq[np.argmax(spec[1:]) + 1] - 440) < 2


def test_non_integer_ratio():
    y = resample(np.ones(4410, np.float32), 44100, 16000)
    assert abs(len(y) - 1600) <= 2
    assert np.allclose(y[100:-100], 1.0, atol=1e-3)
