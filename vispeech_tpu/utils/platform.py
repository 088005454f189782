"""--platform CLI plumbing.

Some deployments pin ``JAX_PLATFORMS`` in the shell profile or a
sitecustomize hook *after* user env vars, so ``JAX_PLATFORMS=cpu python ...``
silently runs on the pinned backend anyway.  ``jax.config`` set before first
device use always wins (same trick as tests/conftest.py), so every CLI takes
an explicit ``--platform {cpu,tpu}`` and applies it here.
"""

from __future__ import annotations

import argparse
from typing import Optional


def add_platform_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--platform", choices=("cpu", "tpu"), default=None,
        help="force the JAX backend (overrides env pinning); default: auto",
    )


def apply_platform(platform: Optional[str]) -> None:
    """Must run before any JAX device use (jit/device access)."""
    if platform is None:
        return
    import jax

    jax.config.update("jax_platforms", platform)
