"""Matmul/conv precision policy.

On TPU, `jax.lax.Precision.HIGHEST` forces fp32-emulated MXU passes (~6×
slower than native bf16); pinning it inside every op would cap serving and
training throughput regardless of the caller's dtype policy.  Ops therefore
ask this module for the precision each trace:

  * default: ``None`` — defer to JAX's global ``jax_default_matmul_precision``
    (bf16 single-pass on TPU unless the user overrides it);
  * ``VISPEECH_MATMUL_PRECISION=highest|high|default`` env var, or
    ``set_matmul_precision(...)``, overrides globally — parity tests against
    the fp32 torch oracle set ``highest``.

The STFT/mel path (dsp/stft.py) intentionally does NOT consult this policy:
it stays at HIGHEST because bit-level mel parity with the reference is a
north-star requirement and its FLOPs are negligible next to the model.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import jax

_Precision = Union[None, str, "jax.lax.Precision"]

_PRECISION: _Precision = os.environ.get("VISPEECH_MATMUL_PRECISION") or None


def set_matmul_precision(precision: _Precision) -> None:
    """Override the op-level matmul precision ('highest'/'high'/'default'/None).

    Takes effect at the next trace; jitted programs already compiled keep the
    precision they were traced with.
    """
    global _PRECISION
    _PRECISION = precision


def get_matmul_precision() -> _Precision:
    p = _PRECISION
    if isinstance(p, str):
        return {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[p.lower()]
    return p
