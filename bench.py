"""Benchmark: vocoder synthesis throughput (audio-seconds/s/chip @ 44.1 kHz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star: ≥500 audio-seconds/s/chip (BASELINE.md).

Measures the flagship HiFi-GAN decoder (512× upsampling, full 44.1 kHz
config) in bfloat16 on whatever backend is available (TPU when present).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vispeech_tpu.config import Config
    from vispeech_tpu.models.generator import Generator

    cfg = Config()
    m = cfg.model
    on_tpu = jax.devices()[0].platform == "tpu"

    gen = Generator(
        resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels,
    )

    B, T = (8, 512) if on_tpu else (1, 64)  # frames of latent per call
    hop = cfg.data.hop_length
    sr = cfg.data.sampling_rate
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (B, T, m.inter_channels), dtype)
    g = jax.random.normal(jax.random.PRNGKey(1), (B, 1, m.gin_channels), dtype)
    params = gen.init(jax.random.PRNGKey(2), z, g)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    fwd = jax.jit(lambda p, z, g: gen.apply(p, z, g))
    out = fwd(params, z, g)
    jax.block_until_ready(out)  # compile + warmup

    n_iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, z, g)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_seconds = n_iters * B * T * hop / sr
    value = audio_seconds / dt
    print(json.dumps({
        "metric": "vocoder_throughput_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip@44.1kHz",
        "vs_baseline": round(value / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
