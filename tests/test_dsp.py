"""DSP parity tests: our JAX STFT/mel vs torch.stft ground truth.

torch (CPU) serves as the independent oracle for the reference's exact
spectrogram semantics (reference mel_processing.py:51-112).
"""

import numpy as np
import pytest
import torch

from vispeech_tpu.dsp import mel_filterbank, mel_spectrogram, spec_to_mel, spectrogram

SR, N_FFT, HOP, WIN, N_MELS = 44100, 2048, 512, 2048, 80


def torch_spectrogram(y: np.ndarray) -> np.ndarray:
    """Oracle implementation of reference mel_processing.spectrogram_torch."""
    t = torch.from_numpy(y).float()
    pad = (N_FFT - HOP) // 2
    t = torch.nn.functional.pad(t.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    window = torch.hann_window(WIN)
    spec = torch.stft(
        t, N_FFT, hop_length=HOP, win_length=WIN, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6)
    return mag.numpy()  # [B, n_bins, T]


@pytest.fixture(scope="module")
def wave():
    rng = np.random.RandomState(0)
    L = 512 * 40  # 40 frames
    t = np.arange(L) / SR
    y = 0.5 * np.sin(2 * np.pi * 220.0 * t) + 0.1 * rng.randn(L)
    return np.clip(y, -1, 1).astype(np.float32)[None, :]


class TestSpectrogram:
    def test_matches_torch(self, wave):
        ours = np.asarray(spectrogram(wave, N_FFT, SR, HOP, WIN))  # [B, T, K]
        oracle = torch_spectrogram(wave).transpose(0, 2, 1)  # [B, T, K]
        assert ours.shape == oracle.shape
        np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-4)

    def test_frame_count(self, wave):
        # with pad (n_fft-hop)/2 both sides, frames == samples // hop
        ours = np.asarray(spectrogram(wave, N_FFT, SR, HOP, WIN))
        assert ours.shape[1] == wave.shape[1] // HOP

    def test_nondivisible_hop_fallback(self):
        y = np.random.RandomState(1).randn(1, 3000).astype(np.float32)
        n_fft, hop = 512, 160  # 512 % 160 != 0 → gather path
        ours = np.asarray(spectrogram(y, n_fft, SR, hop, n_fft))
        t = torch.from_numpy(y).float()
        pad = (n_fft - hop) // 2
        t = torch.nn.functional.pad(t.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
        spec = torch.stft(
            t, n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft), center=False, return_complex=True,
        )
        oracle = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-6).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-4)


class TestMelFilterbank:
    def test_shape_and_coverage(self):
        fb = mel_filterbank(SR, N_FFT, N_MELS, 0.0, None)
        assert fb.shape == (N_MELS, N_FFT // 2 + 1)
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(axis=1) > 0).all()

    def test_slaney_normalization(self):
        # peak value ≈ the Slaney enorm factor 2/bandwidth at the triangle
        # apex; exact only where the FFT grid resolves the apex, so restrict
        # to filters wider than ~8 bins
        fb = mel_filterbank(SR, N_FFT, N_MELS, 0.0, None)
        from vispeech_tpu.dsp.mel import hz_to_mel, mel_to_hz

        mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2), N_MELS + 2)
        hz_pts = mel_to_hz(mel_pts)
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        bin_hz = SR / N_FFT
        wide = (hz_pts[2:] - hz_pts[:-2]) > 8 * bin_hz
        assert wide.sum() > 20
        # apex falls between FFT grid points → sampled peak slightly under
        ratio = fb.max(axis=1)[wide] / enorm[wide]
        assert (ratio > 0.85).all() and (ratio <= 1.0 + 1e-6).all()

    def test_peak_locations(self):
        # filter m peaks at the FFT bin nearest its center frequency
        fb = mel_filterbank(SR, N_FFT, N_MELS, 0.0, None)
        from vispeech_tpu.dsp.mel import hz_to_mel, mel_to_hz

        mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2), N_MELS + 2)
        centers_hz = mel_to_hz(mel_pts)[1:-1]
        fft_freqs = np.linspace(0, SR / 2, 1 + N_FFT // 2)
        for m in range(0, N_MELS, 7):
            peak_bin = fb[m].argmax()
            expect_bin = np.abs(fft_freqs - centers_hz[m]).argmin()
            assert abs(int(peak_bin) - int(expect_bin)) <= 1

    def test_mel_scale_roundtrip(self):
        from vispeech_tpu.dsp.mel import hz_to_mel, mel_to_hz

        f = np.array([0.0, 500.0, 1000.0, 4000.0, 22050.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
        # linear below 1 kHz
        assert np.isclose(hz_to_mel(500.0), 7.5)


class TestMelSpectrogram:
    def test_log_compression_floor(self, wave):
        mel = np.asarray(mel_spectrogram(wave * 0, N_FFT, N_MELS, SR, HOP, WIN, 0.0, None))
        # silence: |X| = sqrt(1e-6) = 1e-3; mel of that is tiny → clamped at 1e-5
        assert np.isfinite(mel).all()
        assert mel.min() >= np.log(1e-5) - 1e-6

    def test_spec_to_mel_consistency(self, wave):
        spec = spectrogram(wave, N_FFT, SR, HOP, WIN)
        mel1 = np.asarray(spec_to_mel(spec, N_FFT, N_MELS, SR, 0.0, None))
        mel2 = np.asarray(mel_spectrogram(wave, N_FFT, N_MELS, SR, HOP, WIN, 0.0, None))
        np.testing.assert_allclose(mel1, mel2, rtol=1e-6)
        assert mel1.shape == (1, wave.shape[1] // HOP, N_MELS)
