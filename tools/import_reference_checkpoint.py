#!/usr/bin/env python
"""Import a reference torch checkpoint (``G_*.pth``) into a framework
checkpoint consumable by ``TTSEngine.from_checkpoint`` / the HTTP server.

    python tools/import_reference_checkpoint.py \
        -c configs/config.json -i path/to/G_100000.pth -o ./imported_run

writes ``imported_run/ckpt_{step}.npz`` (+ copies the config alongside), so

    python -m vispeech_tpu.infer.cli -c imported_run/config.json -k imported_run -t ...

serves the reference-trained voice.  Load semantics follow the reference
(utils.py:21-51): the ``model`` entry of the .pth dict, tolerant of the DDP
``module.`` prefix; ``iteration`` becomes the checkpoint step (overridable).

Requires torch (CPU is fine) to deserialize the .pth.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def import_checkpoint(
    config_path: str, pth_path: str, out_dir: str, step=None,
) -> str:
    """Core import: returns the written npz path."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from vispeech_tpu.config import load_config
    from vispeech_tpu.models import Synthesizer
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.utils.checkpoint import flatten_state
    from vispeech_tpu.utils.reference_import import map_reference_state_dict

    cfg = load_config(config_path)
    model = Synthesizer.from_config(cfg, N_SYMBOLS)

    # materialize the full param tree (shapes are input-independent; a tiny
    # batch through the training forward initializes every submodule,
    # including enc_q and the flow's forward direction)
    B, N = 1, 8
    T = max(cfg.train.segment_size // cfg.data.hop_length, N)
    init = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.ones((B, N), jnp.int32),
        jnp.full((B,), N, jnp.int32),
        jnp.full((B, N), 150.0, jnp.float32),
        jnp.full((B, N), 60.0, jnp.float32),
        jnp.full((B, N), T // N, jnp.int32),
        jnp.zeros((B, T, cfg.data.spec_channels), jnp.float32),
        jnp.full((B,), T, jnp.int32),
        sid=jnp.zeros((B,), jnp.int32),
        deterministic=True,
    ))
    variables = init()

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=True)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = map_reference_state_dict(
        sd, variables,
        n_resblock_kernels=len(cfg.model.resblock_kernel_sizes),
    )

    if step is None:
        step = int(ckpt.get("iteration", 0)) if isinstance(ckpt, dict) else 0
        m = re.search(r"G_(\d+)\.pth$", os.path.basename(pth_path))
        if step == 0 and m:
            step = int(m.group(1))

    os.makedirs(out_dir, exist_ok=True)
    flat = flatten_state({"params_g": variables})
    path = os.path.join(out_dir, f"ckpt_{step}.npz")
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    out_cfg = os.path.join(out_dir, "config.json")
    if os.path.abspath(out_cfg) != os.path.abspath(config_path):
        shutil.copyfile(config_path, out_cfg)
    return path


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-c", "--config", required=True,
                   help="reference-format config.json the .pth was trained with")
    p.add_argument("-i", "--input", required=True, help="G_*.pth checkpoint")
    p.add_argument("-o", "--output", required=True, help="output run directory")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: iteration in the .pth, "
                        "else parsed from the filename)")
    args = p.parse_args()
    path = import_checkpoint(args.config, args.input, args.output, args.step)
    print(f"wrote {path}")
    print(f"serve with: python -m vispeech_tpu.infer.server "
          f"-c {os.path.join(args.output, 'config.json')} -k {args.output}")


if __name__ == "__main__":
    main()
