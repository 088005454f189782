"""Device-side DSP: 44.1 kHz STFT and log-mel front end.

Exact behavioral parity with the reference pipeline (mel_processing.py:51-112):
center=False reflect-padded STFT, |X| = sqrt(re²+im²+1e-6), Slaney-scale mel
filterbank, dynamic-range compression log(clamp(x, 1e-5)).
"""

from vispeech_tpu.dsp.mel import mel_filterbank
from vispeech_tpu.dsp.stft import (
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
)

__all__ = ["mel_filterbank", "spectrogram", "spec_to_mel", "mel_spectrogram"]
