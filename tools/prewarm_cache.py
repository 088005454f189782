#!/usr/bin/env python
"""Prewarm the persistent XLA compilation cache for the test suite.

The fast test tier spends most of its cold wall-clock in a handful of
multi-minute XLA CPU compiles (the tiny-config GAN train step, the bf16
serving program, the TTSEngine inference bucket, the pipeline/context-
parallel programs).  The suite uses a persistent compilation cache
(tests/conftest.py → ``/tmp/vispeech_jax_cache`` unless
``VISPEECH_JAX_CACHE_DIR`` overrides it), so running this tool once on a
fresh machine moves those compiles out of the timed test run; repeat suite
invocations then finish well inside a 10-minute CI budget.

    python tools/prewarm_cache.py            # compile-heavy test subset
    python tools/prewarm_cache.py --all      # the whole fast tier

Implementation: simply runs the compile-dominated tests through pytest —
this guarantees the warmed cache keys are EXACTLY the graphs the suite
compiles (any hand-maintained list of jit calls would drift).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

# The compile-dominated fast-tier tests (see pytest --durations):
HEAVY = [
    "tests/test_train_step.py",
    "tests/test_serving_policy.py",
    "tests/test_infer.py",
    "tests/test_models.py",
    "tests/test_pipeline.py",
    "tests/test_context_parallel.py",
    "tests/test_pallas_kernels.py",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="warm the entire fast tier, not just the heavy files")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = ["tests/"] if args.all else HEAVY
    cache = os.environ.get("VISPEECH_JAX_CACHE_DIR", "/tmp/vispeech_jax_cache")
    t0 = time.time()
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "-q", "-m", "not slow", *target],
        cwd=root,
    )
    print(f"prewarm: {time.time() - t0:.0f}s, cache at {cache} "
          f"({sum(1 for _ in os.scandir(cache)) if os.path.isdir(cache) else 0}"
          f" entries)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
