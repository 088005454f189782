#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (BASELINE.md: ≥90% from 1 host
to N hosts).

On a real pod slice this measures true scaling over ICI/DCN.  Without TPUs it
runs on a virtual CPU device mesh (``--force-cpu-devices N``), which
validates the sharded program and the harness itself; CPU timing numbers are
not meaningful as hardware efficiency.

    python benchmarks/bench_scaling.py --devices 1 8 --steps 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 8])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--force-cpu-devices", type=int, default=None,
                   help="emulate N devices on CPU (sets XLA_FLAGS; must be "
                        "set before jax import)")
    args = p.parse_args()

    if args.force_cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vispeech_tpu.parallel import make_mesh, shard_batch
    from vispeech_tpu.train.step import Batch, create_train_state, make_train_step
    from vispeech_tpu.text.symbols import N_SYMBOLS

    hop = 64
    cfg = Config(
        train=TrainConfig(fp16_run=jax.default_backend() == "tpu",
                          segment_size=4 * hop, batch_size=args.batch_per_device),
        data=DataConfig(sampling_rate=8000, filter_length=256, hop_length=hop,
                        win_length=256, n_mel_channels=20),
        model=ModelConfig(inter_channels=64, hidden_channels=64,
                          filter_channels=128, n_layers=2,
                          upsample_rates=(4, 4, 2, 2),
                          upsample_initial_channel=64,
                          upsample_kernel_sizes=(8, 8, 4, 4),
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3),),
                          gin_channels=32),
    )

    def make_batch(n_dev):
        B = args.batch_per_device * n_dev
        N, T = 32, args.frames
        rng = np.random.RandomState(0)
        return Batch(
            phonemes=jnp.asarray(rng.randint(1, N_SYMBOLS, (B, N)), jnp.int32),
            phoneme_lengths=jnp.full((B,), N, jnp.int32),
            f0=jnp.full((B, N), 150.0, jnp.float32),
            energy=jnp.full((B, N), 60.0, jnp.float32),
            duration=jnp.full((B, N), T // N, jnp.int32),
            spec=jnp.asarray(rng.rand(B, T, cfg.data.spec_channels), jnp.float32),
            spec_lengths=jnp.full((B,), T, jnp.int32),
            wav=jnp.asarray(rng.randn(B, T * hop, 1) * 0.1, jnp.float32),
            wav_lengths=jnp.full((B,), T * hop, jnp.int32),
            sid=jnp.zeros((B,), jnp.int32),
        )

    results = []
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            print(f"skip {n_dev} devices (only {len(jax.devices())})",
                  file=sys.stderr)
            continue
        mesh = make_mesh(data=n_dev, model=1,
                         devices=jax.devices()[:n_dev])
        batch = make_batch(n_dev)
        rng = jax.random.PRNGKey(0)
        state, mg, md = create_train_state(cfg, rng, N_SYMBOLS, batch)
        step = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)
        def fetch_scalar(state):
            # scalar host fetch of a post-update parameter: the only reliable
            # sync on the tunneled TPU runtime (block_until_ready is a no-op
            # there); each step donates+consumes the previous state, so the
            # fetched value depends on the whole chain
            leaf = jax.tree_util.tree_leaves(state.params_g)[0]
            return float(jnp.sum(leaf))

        with mesh:
            sbatch = shard_batch(batch, mesh)
            state, _ = step(state, sbatch)  # compile
            fetch_scalar(state)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, metrics = step(state, sbatch)
            fetch_scalar(state)
            dt = (time.perf_counter() - t0) / args.steps
        utts_per_s = batch.phonemes.shape[0] / dt
        results.append({"devices": n_dev, "step_ms": dt * 1e3,
                        "utts_per_s": utts_per_s})
        print(f"{n_dev} devices: {dt*1e3:.1f} ms/step, {utts_per_s:.1f} utts/s")

    if len(results) >= 2:
        base = results[0]
        last = results[-1]
        ratio = last["devices"] / base["devices"]
        eff = (last["utts_per_s"] / base["utts_per_s"]) / ratio
        print(json.dumps({
            "scaling_efficiency": eff,
            "from_devices": base["devices"],
            "to_devices": last["devices"],
            "results": results,
        }))


if __name__ == "__main__":
    main()
