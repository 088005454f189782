#!/usr/bin/env python
"""Single-chip GAN train-step throughput at the flagship config.

Measures steps/s (and utterance-seconds of audio trained per second) for the
full jitted D-then-G train step — the number the reference never records
(its per-phase timers are commented out, train.py:158-228).  Also the
regression guard for the vjp single-forward restructure (train/step.py).

    python benchmarks/bench_train.py [--batch 12] [--frames 1024] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_batch(cfg, B: int, N: int, T: int):
    from vispeech_tpu.train.step import Batch

    hop = cfg.data.hop_length
    r = np.random.RandomState(0)
    # durations that sum near T so masks are realistic
    dur = np.full((B, N), T // N, np.int32)
    dur[:, -1] += T - dur.sum(1)
    spec_lengths = dur.sum(1).astype(np.int32)
    return Batch(
        phonemes=jnp.asarray(r.randint(1, 500, (B, N)), jnp.int32),
        phoneme_lengths=jnp.full((B,), N, jnp.int32),
        f0=jnp.asarray(r.uniform(80, 400, (B, N)).astype(np.float32)),
        energy=jnp.asarray(r.uniform(30, 90, (B, N)).astype(np.float32)),
        duration=jnp.asarray(dur),
        spec=jnp.asarray(r.randn(B, T, cfg.data.spec_channels).astype(np.float32)),
        spec_lengths=jnp.asarray(spec_lengths),
        wav=jnp.asarray(
            np.clip(r.randn(B, T * hop, 1) * 0.1, -1, 1).astype(np.float32)
        ),
        wav_lengths=jnp.asarray(spec_lengths * hop),
        sid=jnp.asarray(r.randint(0, 4, (B,)), jnp.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--json", action="store_true")
    # Defaults mirror the SHIPPED training policy (config.TrainConfig:
    # f32 + fused attention + fused WN + folded MRF) so an unflagged run
    # reports the number the framework actually trains at; every kernel and
    # the diverging bf16 policy stay A/B-able via explicit flags.
    ap.add_argument(
        "--no-fused-wn", dest="fused_wn", action="store_false", default=True,
        help="XLA WN stack in posterior/flows (A/B against the default "
             "fused custom-VJP kernel)",
    )
    ap.add_argument(
        "--bf16", dest="bf16", action="store_true", default=False,
        help="enable the bf16 policy (train.fp16_run) — A/B only; known to "
             "diverge in convergence runs (see config.TrainConfig.fp16_run)",
    )
    ap.add_argument(
        "--bf16-full", action="store_true",
        help="everything-bf16 scope (A/B; default 'stable' keeps dec+D f32)",
    )
    ap.add_argument(
        "--bf16-disc", action="store_true",
        help="discriminators in bf16 (cfg.train.bf16_disc; composes with "
             "--bf16 tail_f32)",
    )
    ap.add_argument(
        "--no-fused-attn", dest="fused_attn", action="store_false",
        default=True,
        help="XLA attention in training (A/B against the fused custom-VJP "
             "attention kernel)",
    )
    ap.add_argument(
        "--no-folded-mrf", dest="folded_mrf", action="store_false",
        default=True,
        help="plain XLA ResBlock decoder path (A/B against the default "
             "differentiable polyphase-folded MRF)",
    )
    args = ap.parse_args()
    if args.bf16_full:
        args.bf16 = True

    import dataclasses

    from vispeech_tpu.config import Config
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, fused_wn=args.fused_wn, fp16_run=args.bf16,
            # default scope comes from config (tail_f32 — the converging
            # policy); --bf16-full selects the legacy everything-bf16 A/B
            bf16_scope="full" if args.bf16_full else cfg.train.bf16_scope,
            bf16_allow_divergent=args.bf16_full,  # explicit legacy A/B
            bf16_disc=args.bf16_disc,
            fused_attn=args.fused_attn, folded_mrf=args.folded_mrf,
        )
    )
    on_tpu = jax.default_backend() == "tpu"
    B = args.batch or (cfg.train.batch_size if on_tpu else 2)
    T = args.frames or (1024 if on_tpu else 32)
    N = max(T // 8, 8)
    batch = make_batch(cfg, B, N, T)

    state, model_g, model_d = create_train_state(
        cfg, jax.random.PRNGKey(0), n_vocab=N_SYMBOLS, batch=batch,
        steps_per_epoch=1000,
    )
    step_fn = jax.jit(make_train_step(cfg, model_g, model_d, steps_per_epoch=1000))

    # fold the step into a fori_loop so tunneled-TPU dispatch overhead and
    # non-synchronizing block_until_ready can't fake the timing (bench.py
    # methodology); the state carry serializes iterations naturally.
    @jax.jit
    def loop(state, batch, n):
        def body(i, st):
            return step_fn(st, batch)[0]
        final = jax.lax.fori_loop(0, n, body, state)
        return step_fn(final, batch)[1]

    def run(n):
        # n traced as a scalar so all calls share one compilation; runs n+1
        # steps total (the metrics step closes the loop)
        metrics = loop(state, batch, jnp.int32(n))
        return float(metrics["loss/g/total"])

    run(0)  # compile + warm
    t0 = time.perf_counter()
    run(args.steps)  # steps+1 total
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    run(0)  # 1 total → subtraction nets exactly args.steps
    t3 = time.perf_counter()
    dt = max((t1 - t0) - (t3 - t2), 1e-9)

    steps_per_s = args.steps / dt
    utt_seconds = B * T * cfg.data.hop_length / cfg.data.sampling_rate
    out = {
        "metric": "train_step_throughput",
        "steps_per_s": round(steps_per_s, 3),
        "audio_seconds_trained_per_s": round(steps_per_s * utt_seconds, 1),
        "batch": B, "frames": T, "backend": jax.default_backend(),
        "fused_wn": args.fused_wn, "bf16": args.bf16,
        "bf16_scope": cfg.train.bf16_scope, "fused_attn": args.fused_attn,
        "folded_mrf": args.folded_mrf,
    }
    print(json.dumps(out) if args.json else out)


if __name__ == "__main__":
    main()
