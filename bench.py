"""Benchmark: end-to-end TTS synthesis throughput (audio-seconds/s/chip at
44.1 kHz), vs the ≥500 north star (BASELINE.md).

Primary metric: the FULL inference path — text encoder → variance adapter →
length regulation → frame prior net (Pallas attention) → flow reverse
(Pallas WN stacks) → HiFi-GAN decoder — on the flagship 44.1 kHz config at
batch 4 × 1408 frames (the reference's max utterance length).  Falls back to
the vocoder-only measurement if the full path cannot run on the local
backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE = 500.0  # audio-seconds/s/chip (BASELINE.md north star)


def bench_e2e(cfg, on_tpu: bool):
    from vispeech_tpu.models import Synthesizer
    from vispeech_tpu.text.symbols import N_SYMBOLS

    model = Synthesizer.from_config(cfg, N_SYMBOLS)
    B, N, T = (8, 192, 1408) if on_tpu else (1, 16, 64)
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
    jax.block_until_ready(variables)

    fwd = jax.jit(lambda v, p, l, s, r: model.apply(
        v, p, l, T, sid=s, noise_scale=0.667,
        method=Synthesizer.infer, rngs={"sample": r},
    )[0])
    key = jax.random.PRNGKey(2)
    fwd(variables, ph, lens, sid, key).block_until_ready()

    n_iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, ph, lens, sid, key)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    audio_seconds = n_iters * B * T * cfg.data.hop_length / cfg.data.sampling_rate
    return "e2e_tts_throughput_audio_seconds_per_s_per_chip", audio_seconds / dt


def bench_vocoder(cfg, on_tpu: bool):
    from vispeech_tpu.models.generator import Generator

    m = cfg.model
    gen = Generator(
        resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels,
    )
    B, T = (8, 512) if on_tpu else (1, 64)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    z = jax.random.normal(jax.random.PRNGKey(0), (B, T, m.inter_channels), dtype)
    g = jax.random.normal(jax.random.PRNGKey(1), (B, 1, m.gin_channels), dtype)
    params = jax.jit(gen.init)(jax.random.PRNGKey(2), z, g)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    fwd = jax.jit(lambda p, z, g: gen.apply(p, z, g))
    fwd(params, z, g).block_until_ready()
    n_iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, z, g)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    audio_seconds = n_iters * B * T * cfg.data.hop_length / cfg.data.sampling_rate
    return "vocoder_throughput_audio_seconds_per_s_per_chip", audio_seconds / dt


def main():
    from vispeech_tpu.config import Config

    cfg = Config()
    on_tpu = jax.devices()[0].platform == "tpu"
    try:
        metric, value = bench_e2e(cfg, on_tpu)
    except Exception:
        metric, value = bench_vocoder(cfg, on_tpu)
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "audio-s/s/chip@44.1kHz",
        "vs_baseline": round(value / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
