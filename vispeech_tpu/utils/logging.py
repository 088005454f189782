"""Logging / observability (reference utils.py:73-81,227-259).

- python logging to stdout + ``train.log`` in the run dir;
- TensorBoard scalars/images/audio via tensorboardX when available, with a
  JSON-lines fallback writer (``events.jsonl``) so headless environments still
  record every scalar;
- git-hash pinning of the code version into the run dir (utils.py:227-244).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import time
from typing import Dict, Optional

import numpy as np

try:  # tensorboardX is present in the image; guard anyway
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover
    _TBWriter = None


def get_logger(save_dir: Optional[str] = None, name: str = "vispeech_tpu") -> logging.Logger:
    """Stdout + file logger (reference utils.py:247-259)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        log_path = os.path.join(save_dir, "train.log")
        if not any(isinstance(h, logging.FileHandler) and getattr(h, "baseFilename", None) == os.path.abspath(log_path)
                   for h in logger.handlers):
            fh = logging.FileHandler(log_path)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


def check_git_hash(save_dir: str) -> Optional[str]:
    """Record the current git hash in the run dir; warn if it changed since
    the run was created (reference utils.py:227-244)."""
    logger = logging.getLogger("vispeech_tpu")
    try:
        cur = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        logger.warning("git hash unavailable; not a git checkout?")
        return None
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "githash")
    if os.path.exists(path):
        saved = open(path).read().strip()
        if saved != cur:
            logger.warning("git hash mismatch: run dir has %s, code is %s", saved, cur)
    else:
        with open(path, "w") as f:
            f.write(cur)
    return cur


class _JsonlWriter:
    """Minimal scalar/audio/image event log when tensorboardX is unavailable."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "events.jsonl"), "a")

    def add_scalar(self, tag, value, global_step=None):
        self._f.write(json.dumps({
            "t": time.time(), "tag": tag, "value": float(value), "step": global_step,
        }) + "\n")
        self._f.flush()

    def add_image(self, *a, **k):
        pass

    def add_audio(self, *a, **k):
        pass

    def close(self):
        self._f.close()

    def flush(self):
        self._f.flush()


class TrainLogger:
    """Scalars / images / audio to TensorBoard (reference utils.py:73-81).

    ``scalars(step, {...})`` takes the metrics dict straight from the jitted
    train step (device arrays fine).  ``image`` expects HWC uint8/float,
    ``audio`` a 1-D float waveform in [-1, 1].
    """

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.writer = _TBWriter(logdir) if _TBWriter is not None else _JsonlWriter(logdir)

    def scalars(self, step: int, metrics: Dict[str, float]) -> None:
        for tag, value in metrics.items():
            self.writer.add_scalar(tag, float(np.asarray(value)), global_step=step)

    def image(self, step: int, tag: str, image_hwc: np.ndarray) -> None:
        img = np.asarray(image_hwc)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        self.writer.add_image(tag, img, global_step=step, dataformats="HWC")

    def audio(self, step: int, tag: str, wav: np.ndarray, sampling_rate: int) -> None:
        wav = np.asarray(wav, np.float32).reshape(-1)
        try:
            self.writer.add_audio(
                tag, wav.reshape(-1, 1), global_step=step, sample_rate=sampling_rate
            )
        except Exception:
            # tensorboardX audio encoding needs soundfile; fall back to wav files
            from scipy.io import wavfile

            audio_dir = os.path.join(self.logdir, "audio")
            os.makedirs(audio_dir, exist_ok=True)
            name = tag.replace("/", "_")
            wavfile.write(
                os.path.join(audio_dir, f"{name}_{step}.wav"),
                sampling_rate,
                (np.clip(wav, -1.0, 1.0) * 32767).astype(np.int16),
            )

    def flush(self) -> None:
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()
