#!/usr/bin/env python
"""Where does end-to-end inference time go?  Times the two pipeline stages
(infer_prior: text→z_p; infer_decode: flow reverse+vocoder) and the vocoder
alone at the flagship serving shape, with the bench.py timing methodology.

    python benchmarks/bench_e2e_breakdown.py [--batch 8] [--frames 1408]
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


def timed_ms(loop_fn, n: int) -> float:
    float(loop_fn(jnp.int32(1)))
    t0 = time.perf_counter()
    float(loop_fn(jnp.int32(n + 1)))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    float(loop_fn(jnp.int32(1)))
    t3 = time.perf_counter()
    return max((t1 - t0) - (t3 - t2), 1e-9) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1408)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from vispeech_tpu.config import Config
    from vispeech_tpu.models import Synthesizer
    from vispeech_tpu.text.symbols import N_SYMBOLS

    cfg = Config()
    model = Synthesizer.for_serving(cfg, N_SYMBOLS)
    B, T = args.batch, args.frames
    N = max(T // 8, 8)
    r = np.random.RandomState(0)
    ph = jnp.asarray(r.randint(1, N_SYMBOLS, (B, N)), jnp.int32)
    lens = jnp.full((B,), N, jnp.int32)
    sid = jnp.zeros((B,), jnp.int32)
    eps = jnp.asarray(r.randn(B, T, cfg.model.inter_channels), jnp.float32)

    init_fn = jax.jit(
        functools.partial(model.init, method=Synthesizer.infer),
        static_argnums=(3,),
    )
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ph, lens, T, sid=sid,
    )
    z_p, frame_mask, *_ = jax.jit(
        lambda v: model.apply(v, ph, lens, T, sid=sid, eps=eps,
                              method=Synthesizer.infer_prior)
    )(variables)
    z = jnp.asarray(r.randn(B, T, cfg.model.inter_channels), jnp.float32)

    def make_loop(fn, x0):
        @jax.jit
        def loop(n):
            def body(i, c):
                return jnp.float32(jnp.mean(fn(x0 + c.astype(x0.dtype) * 1e-30)))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return loop

    stages = {
        "prior (text→z_p)": make_loop(
            lambda e: model.apply(variables, ph, lens, T, sid=sid, eps=e,
                                  method=Synthesizer.infer_prior)[0], eps),
        "decode (flow+vocoder)": make_loop(
            lambda zp: model.apply(variables, zp, frame_mask, sid=sid,
                                   method=Synthesizer.infer_decode)[0], z_p),
        "vocoder only": make_loop(
            lambda zz: model.apply(variables, zz * frame_mask, None,
                                   method=Synthesizer._decode), z),
        "full infer": make_loop(
            lambda e: model.apply(variables, ph, lens, T, sid=sid, eps=e,
                                  method=Synthesizer.infer)[0], eps),
    }
    audio_s = B * T * cfg.data.hop_length / cfg.data.sampling_rate
    out = {}
    for name, loop in stages.items():
        ms = timed_ms(loop, args.iters)
        out[name] = {"ms": round(ms, 2),
                     "audio_s_per_s": round(audio_s / (ms / 1e3), 1)}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
