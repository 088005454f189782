"""Pallas TPU kernels for the hot ops (SURVEY.md §2.8 native-components
ledger: fused attention, WN gate).  Every kernel has an XLA-equivalent
reference path and is tested against it in interpret mode on CPU."""

from vispeech_tpu.ops.pallas.flash_attention import relative_self_attention

__all__ = ["relative_self_attention"]
