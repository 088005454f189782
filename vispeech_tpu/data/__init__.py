"""Dataset / host data pipeline."""

from vispeech_tpu.data.dataset import (
    BucketSampler,
    FilelistDataset,
    Utterance,
    collate,
    data_loader,
    numpy_spectrogram,
    parse_filelist_line,
)

__all__ = [
    "BucketSampler",
    "FilelistDataset",
    "Utterance",
    "collate",
    "data_loader",
    "numpy_spectrogram",
    "parse_filelist_line",
]
