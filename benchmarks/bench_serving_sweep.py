#!/usr/bin/env python
"""Serving-throughput sweep: e2e TTS audio-seconds/s/chip vs batch size.

Finds the throughput-optimal serving batch for the flagship 44.1 kHz config
(bench.py measures at one point; this maps the curve so the serving batch is
a measured choice, not a guess).

    python benchmarks/bench_serving_sweep.py [--batches 4,8,16,32] [--frames 1408]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, B: int, T: int, n_iters: int) -> float:
    """audio-seconds/s for batch B × T frames (bench.py timing methodology:
    one jitted fori_loop, full-output-reduction carry, 1-iter subtraction)."""
    from vispeech_tpu.models import Synthesizer
    from vispeech_tpu.text.symbols import N_SYMBOLS

    model = Synthesizer.for_serving(cfg, N_SYMBOLS)
    N = max(T // 8, 8)
    rng = np.random.RandomState(0)
    ph = jnp.asarray(rng.randint(1, N_SYMBOLS, (B, N)), jnp.int32)
    lens = jnp.full((B,), N, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    init_fn = jax.jit(
        functools.partial(model.init, method=Synthesizer.infer),
        static_argnums=(3,),
    )
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ph, lens, T, sid=sid,
    )

    @jax.jit
    def loop(variables, n):
        def body(i, carry):
            audio = model.apply(
                variables, ph, lens, T, sid=sid,
                noise_scale=0.667 + carry * 1e-30,
                method=Synthesizer.infer,
                rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(2), i)},
            )[0]
            return jnp.float32(jnp.mean(audio))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(variables, jnp.int32(1)))  # compile + warm
    t0 = time.perf_counter()
    float(loop(variables, jnp.int32(n_iters + 1)))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    float(loop(variables, jnp.int32(1)))
    t3 = time.perf_counter()
    dt = max((t1 - t0) - (t3 - t2), 1e-9)
    audio_seconds = n_iters * B * T * cfg.data.hop_length / cfg.data.sampling_rate
    return audio_seconds / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16,32")
    ap.add_argument("--frames", type=int, default=1408)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from vispeech_tpu.config import Config

    cfg = Config()
    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        try:
            results[b] = round(measure(cfg, b, args.frames, args.iters), 1)
        except Exception as e:  # noqa: BLE001 - OOM at large B is informative
            results[b] = f"error: {type(e).__name__}"
        print(json.dumps({"batch": b, "frames": args.frames,
                          "audio_s_per_s_per_chip": results[b]}), flush=True)
    best = max((v, k) for k, v in results.items() if isinstance(v, float))
    print(json.dumps({"best_batch": best[1], "best": best[0]}))


if __name__ == "__main__":
    main()
