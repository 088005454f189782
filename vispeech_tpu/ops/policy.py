"""Serving dtype / kernel-dispatch policy.

Round-1 lesson: dtype and kernel selection used to be decided *inside* the
traced model from env vars + ``jax.default_backend()`` — an untestable branch
that shipped broken on the one backend it targeted.  Policy is now explicit,
jit-static model configuration (``Synthesizer.decode_dtype`` /
``fused_decode`` / ``attn_pallas``), resolved ONCE on the host at model
construction time by :func:`default_serving_policy`.  Tests construct the
model with any policy on any backend (bf16 works on CPU; Pallas kernels run
in interpret mode off-TPU), so the TPU serving configuration is covered
without TPU hardware.

Env vars are honored only here (debug escape hatches, never read in traced
code): ``VISPEECH_DISABLE_BF16_DECODER=1`` forces a float32 decoder;
``VISPEECH_DISABLE_PALLAS=1`` disables all Pallas kernel dispatch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class ServingPolicy:
    """Static serving configuration for the Synthesizer.

    decode_dtype: activation dtype for the HiFi-GAN decoder ("float32" or
        "bfloat16") — where nearly all inference FLOPs/memory live.
    fused_decode: dispatch the MRF stages to the fused Pallas / polyphase-
        folded kernels (inference-only; no VJP).
    attn_pallas: force (True) / forbid (False) / auto-select (None) the
        fused Pallas relative-attention kernel in the encoder stacks.
    """

    decode_dtype: str = "float32"
    fused_decode: bool = False
    attn_pallas: Optional[bool] = None


#: Training / parity default — float32, pure-XLA (differentiable) paths.
FLOAT32_XLA = ServingPolicy()


def default_serving_policy(backend: Optional[str] = None) -> ServingPolicy:
    """The measured-fastest policy for ``backend`` (default: current one).

    TPU: bfloat16 decoder + fused Pallas/folded MRF + Pallas attention.
    Everything else: float32, pure XLA.
    """
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return FLOAT32_XLA
    pallas = not os.environ.get("VISPEECH_DISABLE_PALLAS")
    bf16 = not os.environ.get("VISPEECH_DISABLE_BF16_DECODER")
    return ServingPolicy(
        decode_dtype="bfloat16" if bf16 else "float32",
        fused_decode=pallas,
        attn_pallas=pallas,
    )
