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


def timeit(f, *args, n=20):
    """Honest device timing: all iterations inside one jitted fori_loop with
    a full-output-reduction carry chained into the next iteration's first
    argument, one scalar host fetch, dispatch overhead cancelled by a
    1-iteration run.  (block_until_ready() does not synchronize on the
    tunneled TPU runtime — naive dispatch loops measure nothing.)"""

    @jax.jit
    def loop(n_, *a):
        def body(i, c):
            aa = (a[0] + c.astype(a[0].dtype) * 1e-30,) + a[1:]
            return jnp.float32(jnp.mean(f(*aa)))
        return jax.lax.fori_loop(0, n_, body, jnp.float32(0))

    float(loop(jnp.int32(1), *args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(jnp.int32(n + 1), *args))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    float(loop(jnp.int32(1), *args))
    t3 = time.perf_counter()
    return max((t1 - t0) - (t3 - t2), 1e-9) / n * 1e3  # ms


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
    f_xla = lambda x: wn_xla.apply(params, x, mask, g=g)
    f_pl = lambda x: wn_pl.apply(params, x, mask, g=g)
    results.append({
        "kernel": "wn_stack", "B": B, "T": T, "C": C, "L": L,
        "pallas_ms": timeit(f_pl, x),
        "xla_ms": timeit(f_xla, x),
    })


def bench_mrf(results, on_tpu):
    """Fused MRF vocoder stage vs the XLA ResBlock1 path, at the two
    low-channel stages that dominate decoder time."""
    from vispeech_tpu.models.generator import Generator

    cases = ((8, 180224, 64), (8, 720896, 32)) if on_tpu else ((1, 256, 16),)
    for B, T, C in cases:
        gen_stage = Generator(
            resblock="1",
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5),) * 3,
            upsample_rates=(1,),
            upsample_initial_channel=2 * C,
            upsample_kernel_sizes=(1,),
            gin_channels=0,
        )
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), dtype)
        params = jax.jit(gen_stage.init)(jax.random.PRNGKey(1), x)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        f_pl = lambda x: gen_stage.apply(params, x, fused=True)
        f_xla = lambda x: gen_stage.apply(params, x, fused=False)
        results.append({
            "kernel": "mrf_stage", "B": B, "T": T, "C": C,
            "pallas_ms": timeit(f_pl, x, n=10),
            "xla_ms": timeit(f_xla, x, n=10),
        })


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    results = []
    bench_attention(results, on_tpu)
    bench_wn(results, on_tpu)
    bench_mrf(results, on_tpu)
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
