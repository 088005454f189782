#!/usr/bin/env python
"""Pallas-vs-XLA kernel microbenchmarks (run on TPU; falls back to CPU
interpret mode for correctness-only runs).

    python benchmarks/bench_kernels.py [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=30):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3  # ms


def xla_relative_attention(q, k, v, rel_k, rel_v, key_mask, window):
    from vispeech_tpu.ops.attention import (
        _absolute_to_relative,
        _pad_rel_embeddings,
        _relative_to_absolute,
    )

    B, H, T, d = q.shape
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)
    rk = jax.vmap(lambda r: _pad_rel_embeddings(r, T, window))(rel_k)
    scores = scores + _relative_to_absolute(
        jnp.einsum("bhtd,hmd->bhtm", q * scale, rk)
    )
    scores = jnp.where(key_mask[:, None, None, :] == 0, -1e4, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", p, v)
    rv = jax.vmap(lambda r: _pad_rel_embeddings(r, T, window))(rel_v)
    return out + jnp.einsum("bhtm,hmd->bhtd", _absolute_to_relative(p), rv)


def bench_attention(results, on_tpu):
    from vispeech_tpu.ops.pallas.flash_attention import relative_self_attention

    B, H, d, w = 8, 2, 96, 4
    for T in (512, 1408) if on_tpu else (128,):
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        q, k, v = mk(B, H, T, d), mk(B, H, T, d), mk(B, H, T, d)
        rk, rv = mk(1, 9, d) * d ** -0.5, mk(1, 9, d) * d ** -0.5
        mask = jnp.ones((B, T), jnp.float32)
        pl_fn = jax.jit(lambda *a: relative_self_attention(
            *a, window=w, interpret=not on_tpu))
        t_pl = timeit(pl_fn, q, k, v, rk, rv, mask)
        row = {"kernel": "relative_self_attention", "T": T, "pallas_ms": t_pl}
        if T <= 512:  # XLA path impractical at 1408
            xla_fn = jax.jit(
                lambda q, k, v, rk, rv, m: xla_relative_attention(
                    q, k, v, rk, rv, m, w))
            row["xla_ms"] = timeit(xla_fn, q, k, v, rk, rv, mask)
        results.append(row)


def bench_wn(results, on_tpu):
    from vispeech_tpu.ops.masking import length_mask
    from vispeech_tpu.ops.wavenet import WN

    B, T, C, gin, L = (8, 1408, 192, 256, 16) if on_tpu else (1, 64, 16, 8, 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, 1, gin).astype(np.float32))
    mask = length_mask(jnp.full((B,), T), T, jnp.float32)
    wn_xla = WN(C, 5, 1, L, gin_channels=gin, use_pallas=False)
    wn_pl = WN(C, 5, 1, L, gin_channels=gin, use_pallas=True)
    params = wn_xla.init(jax.random.PRNGKey(0), x, mask, g=g)
    f_xla = jax.jit(lambda p, x: wn_xla.apply(p, x, mask, g=g))
    f_pl = jax.jit(lambda p, x: wn_pl.apply(p, x, mask, g=g))
    results.append({
        "kernel": "wn_stack", "B": B, "T": T, "C": C, "L": L,
        "pallas_ms": timeit(f_pl, params, x),
        "xla_ms": timeit(f_xla, params, x),
    })


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    results = []
    bench_attention(results, on_tpu)
    bench_wn(results, on_tpu)
    if args.json:
        print(json.dumps({"backend": jax.default_backend(), "results": results}))
    else:
        print(f"backend: {jax.default_backend()}")
        for r in results:
            extra = f"  xla {r['xla_ms']:.3f} ms" if "xla_ms" in r else ""
            print(f"{r['kernel']:28s} T={r.get('T','-')}: "
                  f"pallas {r['pallas_ms']:.3f} ms{extra}")


if __name__ == "__main__":
    main()
