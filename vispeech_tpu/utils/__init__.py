"""Auxiliary subsystems: checkpointing, logging, plotting, profiling.

TPU-native replacements for the reference's utils.py (checkpoint save/load,
TensorBoard summaries, matplotlib figures, git-hash pinning).
"""

from vispeech_tpu.utils.checkpoint import (
    latest_checkpoint_step,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from vispeech_tpu.utils.logging import TrainLogger, check_git_hash, get_logger

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint_step",
    "prune_checkpoints",
    "TrainLogger",
    "get_logger",
    "check_git_hash",
]
