"""Model layer: the Synthesizer generator and GAN discriminators."""

from vispeech_tpu.models.discriminator import MultiPeriodDiscriminator
from vispeech_tpu.models.synthesizer import Synthesizer

__all__ = ["Synthesizer", "MultiPeriodDiscriminator"]
