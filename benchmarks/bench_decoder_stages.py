#!/usr/bin/env python
"""Per-stage decoder timing at the flagship serving shape (bf16): each
upsample conv-transpose and each MRF stage, in the measured dispatch tier the
full generator uses (XLA >=128 ch, Pallas ch-major @64, polyphase-folded
@32).  Identifies which stage to attack next.

    python benchmarks/bench_decoder_stages.py [--batch 16] [--frames 1408]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from bench_kernels import timeit  # honest fori_loop timing


class MRFStage(nn.Module):
    """One MRF stage in the same dispatch tier Generator picks at this
    channel count (XLA >=128, Pallas ch-major @64, polyphase-folded <64)."""

    ch: int
    fused: bool

    @nn.compact
    def __call__(self, x):
        from vispeech_tpu.ops.resblock import ResBlock1

        blocks = [
            ResBlock1(self.ch, rk, (1, 3, 5), name=f"res_{j}")
            for j, rk in enumerate((3, 7, 11))
        ]
        fold = max(1, 128 // self.ch)
        if self.fused and self.ch < 64 and x.shape[1] % fold == 0:
            from vispeech_tpu.ops.folded_mrf import mrf_stage_folded

            packed = tuple(b(x, collect=True) for b in blocks)
            return mrf_stage_folded(
                x, packed, kernel_sizes=(3, 7, 11),
                dilations=((1, 3, 5),) * 3, fold=fold,
            )
        if self.fused and self.ch == 64:
            from vispeech_tpu.ops.pallas.mrf_stage import mrf_stack

            packed = tuple(b(x, collect=True) for b in blocks)
            return mrf_stack(
                x, packed, kernel_sizes=(3, 7, 11),
                dilations=((1, 3, 5),) * 3,
                interpret=jax.default_backend() != "tpu",
            )
        acc = None
        for b in blocks:
            y = b(x)
            acc = y if acc is None else acc + y
        return acc / 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=1408)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from vispeech_tpu.ops.layers import Conv1d, WNConvTranspose1d

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B, T0 = args.batch, args.frames
    rates = (8, 8, 4, 2)
    kernels = (16, 16, 4, 4)
    chans = (512, 256, 128, 64, 32)

    rows = []

    def bench(name, module, x, **apply_kw):
        params = jax.jit(module.init)(jax.random.PRNGKey(0), x, **apply_kw)
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        ms = timeit(lambda xx: module.apply(params, xx, **apply_kw), x,
                    n=args.iters)
        rows.append({"stage": name, "T": x.shape[1], "C_in": x.shape[2],
                     "ms": round(ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, T0, 192), dtype)
    bench("conv_pre k7 192->512", Conv1d(512, 7, padding=3), x)

    t = T0
    for i, (u, k) in enumerate(zip(rates, kernels)):
        cin, cout = chans[i], chans[i + 1]
        x = jax.random.normal(jax.random.PRNGKey(2 + i), (B, t, cin), dtype)
        bench(f"up_{i} convT k{k} s{u} {cin}->{cout}",
              WNConvTranspose1d(cout, k, u), x)
        t *= u
        mrf = MRFStage(ch=cout, fused=on_tpu)
        y = jax.random.normal(jax.random.PRNGKey(12 + i), (B, t, cout), dtype)
        bench(f"mrf_{i} C{cout} (dispatch tier)", mrf, y)

    x = jax.random.normal(jax.random.PRNGKey(9), (B, t, 32), dtype)
    bench("conv_post k7 32->1", Conv1d(1, 7, padding=3, use_bias=False), x)

    total = sum(r["ms"] for r in rows)
    print(json.dumps({"sum_ms": round(total, 2), "batch": B, "frames": T0}))


if __name__ == "__main__":
    main()
