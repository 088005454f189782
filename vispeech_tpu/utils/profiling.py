"""Profiling hooks (SURVEY.md §5: first-class tracing module).

Thin wrappers over jax.profiler so call sites stay clean:

- ``trace(logdir)``: context manager capturing an XLA/TPU trace viewable in
  TensorBoard or Perfetto;
- ``annotate(name)``: TraceAnnotation for host-side phases;
- ``device_memory_stats()``: per-device HBM usage dict.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, step: Optional[int] = None):
    name = f"step_{step}" if step is not None else None
    jax.profiler.start_trace(logdir)
    try:
        if name is not None:
            with jax.profiler.StepTraceAnnotation("train", step_num=step):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """`with annotate("data_load"): ...` — shows up on the host timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", None)
        if callable(stats):
            s = stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                    "bytes_limit": s.get("bytes_limit", 0),
                }
    return out
