"""Reference-checkpoint weight mapping: torch ``G_*.pth`` → flax params.

The reference ecosystem's value is its trained checkpoints (reference
utils.py:21-51 load semantics, models.py:532-732 layout); this module maps
every parameter of the reference ``SynthesizerTrn`` state dict onto our
``models.Synthesizer`` tree.  The flax parameter layouts were designed
torch-compatible (ops/layers.py docstring), so the mapping is a pure
rename + layout transform:

  * conv kernels  [cout, cin, k]  → [k, cin, cout]
  * transposed-conv kernels [cin, cout, k] → kernel-flipped [k, cin, cout]
    (torch ConvTranspose1d cross-correlates; lax transposed conv convolves)
  * weight-norm ``weight_g`` [cout,1,1] → ``g`` [cout]
  * linear [out, in] → [in, out]

The reference's dead weights (enc_p.proj, frame_prior_net.emb, the unused
energy-predictor projection — models.py:166,456) are skipped; any OTHER
unconsumed torch key is an error, so architecture drift fails loudly.

No torch import here: callers hand in ``{key: np.ndarray}`` (see
tools/import_reference_checkpoint.py for the .pth loader).
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax.numpy as jnp
import numpy as np

try:  # flax only needed for tree flatten/unflatten
    import flax
except ImportError:  # pragma: no cover
    flax = None

# flax module-name prefix → torch submodule-list name
_SEG_RULES = {
    "attn_": "attn_layers.",
    "norm1_": "norm_layers_1.",
    "norm2_": "norm_layers_2.",
    "ffn_": "ffn_layers.",
    "in_": "in_layers.",
    "res_skip_": "res_skip_layers.",
    "couplings_": "flows.",  # index doubled below (odd indices are Flips)
    "up_": "ups.",
}

# torch key prefixes that are dead weights in the reference (never used by
# forward) and therefore have no flax counterpart
DEAD_REFERENCE_PREFIXES = (
    "enc_p.proj.",                        # defined but unused (models.py:166)
    "frame_prior_net.emb.",               # dead Embedding(121,h) (models.py:456)
    "energy_predictor.predictor.proj.",   # dead Linear(1,C)
)


def torch_key(path: Tuple[str, ...], n_resblock_kernels: int) -> str:
    """Translate a flax param path tuple into the reference state_dict key."""
    in_variance_predictor = "predictor" in path
    segs = []
    for seg in path[:-1]:
        matched = False
        for ours, theirs in _SEG_RULES.items():
            if seg.startswith(ours) and seg[len(ours):].isdigit():
                idx = int(seg[len(ours):])
                if ours == "couplings_":
                    idx *= 2
                segs.append(theirs + str(idx))
                matched = True
                break
        if matched:
            continue
        if seg.startswith("res_") and seg.count("_") == 2:
            i, j = map(int, seg.split("_")[1:])
            segs.append(f"resblocks.{i * n_resblock_kernels + j}")
        elif seg.startswith("conv1_"):
            segs.append(f"convs1.{seg[6:]}")
        elif seg.startswith("conv2_"):
            segs.append(f"convs2.{seg[6:]}")
        elif in_variance_predictor and seg in ("conv_1", "conv_2"):
            segs.append(f"conv_layer.{seg}.conv")
        elif in_variance_predictor and seg in ("ln_1", "ln_2"):
            segs.append(f"conv_layer.layer_norm_{seg[-1]}")
        elif in_variance_predictor and seg == "linear":
            segs.append("linear_layer")
        else:
            segs.append(seg)
    leaf = path[-1]
    if leaf == "kernel":
        leaf = "weight"
    elif leaf == "v":
        leaf = "weight_v"
    elif leaf == "g":
        leaf = "weight_g"
    elif leaf == "embedding":
        leaf = "weight"
    elif leaf in ("gamma", "beta"):
        # nn.LayerNorm (VariancePredictor) uses weight/bias; the reference's
        # modules.LayerNorm uses gamma/beta
        if in_variance_predictor:
            leaf = "weight" if leaf == "gamma" else "bias"
    segs.append(leaf)
    return ".".join(segs)


def convert_tensor(path: Tuple[str, ...], a: np.ndarray) -> jnp.ndarray:
    """Torch ndarray → flax array with the layout transforms from
    ops/layers.py (conv [cout,cin,k]→[k,cin,cout]; transposed conv
    [cin,cout,k]→flipped [k,cin,cout]; weight-norm g squeezed)."""
    leaf = path[-1]
    is_transposed_conv = any(
        s.startswith("up_") and s[3:].isdigit() for s in path
    )
    if leaf == "kernel":
        if a.ndim == 3:
            a = a.transpose(2, 1, 0)
        elif a.ndim == 2:  # nn.Dense
            a = a.transpose(1, 0)
    elif leaf == "v":
        if is_transposed_conv:
            a = a.transpose(2, 0, 1)[::-1].copy()
        else:
            a = a.transpose(2, 1, 0)
    elif leaf == "g":
        a = a.reshape(-1)
    return jnp.asarray(a)


def strip_ddp_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove the ``module.`` prefix DDP-saved state dicts carry
    (reference utils.py:33-43 handles both layouts)."""
    if any(k.startswith("module.") for k in sd):
        return {
            (k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()
        }
    return sd


def map_reference_state_dict(
    sd: Dict[str, np.ndarray],
    flax_variables: dict,
    n_resblock_kernels: int = 3,
    extra_dead_prefixes: Iterable[str] = (),
) -> dict:
    """Map a reference ``SynthesizerTrn`` state dict onto our param tree.

    `flax_variables` is ``{"params": ...}`` from ``Synthesizer.init`` — its
    tree structure/shapes define the target; values are replaced.  Raises
    AssertionError on any missing torch key, any shape mismatch, and any
    non-dead torch key left unconsumed.
    """
    if flax is None:  # pragma: no cover
        raise RuntimeError("flax is required for map_reference_state_dict")
    sd = strip_ddp_prefix(sd)
    flat = flax.traverse_util.flatten_dict(flax_variables["params"])
    mapped, used = {}, set()
    for path, val in flat.items():
        key = torch_key(path, n_resblock_kernels)
        assert key in sd, f"no torch param for flax {'/'.join(path)} → {key}"
        t = convert_tensor(path, np.asarray(sd[key]))
        assert t.shape == val.shape, (
            f"{'/'.join(path)}: torch {key} {tuple(t.shape)} vs flax "
            f"{tuple(val.shape)}"
        )
        mapped[path] = t
        used.add(key)
    dead = tuple(DEAD_REFERENCE_PREFIXES) + tuple(extra_dead_prefixes)
    leftovers = [
        k for k in sd
        if k not in used and not any(k.startswith(d) for d in dead)
    ]
    assert not leftovers, f"unmapped torch params: {leftovers[:8]}"
    return {"params": flax.traverse_util.unflatten_dict(mapped)}
