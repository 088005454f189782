"""Benchmark: end-to-end TTS synthesis throughput (audio-seconds/s/chip at
44.1 kHz), vs the ≥500 north star (BASELINE.md).

Primary metric: the FULL inference path — text encoder → variance adapter →
length regulation → frame prior net → flow reverse → HiFi-GAN decoder — on
the flagship 44.1 kHz config at batch 8 × 1408 frames (the reference's max
utterance length).  Falls back to the vocoder-only measurement if the full
path cannot run on the local backend.

Timing methodology: on the tunneled TPU runtime `block_until_ready()` does
not synchronize, so naive dispatch loops measure nothing.  All iterations
run inside ONE jitted `lax.fori_loop` whose carry is a full-output reduction
(mean over every audio sample) mixed back into the next iteration's noise
scale — XLA can neither hoist the body nor dead-code any part of the model —
and the only host sync is the final scalar fetch.  Overhead is cancelled by
subtracting a 1-iteration run.  Validated against an 8192³ bf16 matmul
(~206 TFLOP/s measured ≈ chip peak; the naive loop reports >4 PFLOP/s).

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


def _timed_loop(loop_fn, n_iters: int) -> float:
    """Seconds for n_iters net iterations of the jitted loop_fn(n).

    n is passed as a traced scalar so both calls share ONE compilation —
    a static n would recompile and charge compile time to the measurement.
    """
    float(loop_fn(jnp.int32(1)))  # compile + warm
    t0 = time.perf_counter()
    float(loop_fn(jnp.int32(n_iters + 1)))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    float(loop_fn(jnp.int32(1)))
    t3 = time.perf_counter()
    return max((t1 - t0) - (t3 - t2), 1e-9)


def bench_e2e(cfg, on_tpu: bool):
    from vispeech_tpu.models import Synthesizer
    from vispeech_tpu.text.symbols import N_SYMBOLS

    # explicit serving policy (ops/policy.py): bf16 + fused kernels on TPU
    model = Synthesizer.for_serving(cfg, N_SYMBOLS)
    # batch 16 is the measured throughput plateau on v5e (528/1025/1062/1061
    # audio-s/s at B=4/8/16/32 — benchmarks/bench_serving_sweep.py)
    B, N, T = (16, 192, 1408) if on_tpu else (1, 16, 64)
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
                # dynamic ≈0 perturbation: serializes iterations, defeats
                # loop-invariant hoisting without changing the computation
                noise_scale=0.667 + carry * 1e-30,
                method=Synthesizer.infer,
                rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(2), i)},
            )[0]
            return jnp.float32(jnp.mean(audio))  # full-output reduction
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    n_iters = 20 if on_tpu else 2
    dt = _timed_loop(lambda n: loop(variables, n), n_iters)
    audio_seconds = n_iters * B * T * cfg.data.hop_length / cfg.data.sampling_rate

    # ---- MFU (VERDICT r4 #4): model FLOPs from XLA cost analysis of the
    # PURE-XLA variant of the same computation (the Pallas kernels compute
    # identical math but hide their FLOPs inside a custom call), divided by
    # the measured fused-path time and the chip's bf16 peak.
    mfu = None
    try:
        from vispeech_tpu.ops.policy import ServingPolicy
        from vispeech_tpu.utils.flops import chip_peaks, roofline_row, xla_cost

        peaks = chip_peaks()
        if peaks is not None:
            xla_model = Synthesizer.from_config(
                cfg, N_SYMBOLS,
                policy=ServingPolicy(decode_dtype="bfloat16",
                                     fused_decode=False, attn_pallas=False),
            )

            # cost analysis at B=1 (FLOPs/bytes are linear in batch; the
            # full-batch XLA-variant compile is heavy on the tunneled
            # compile helper), scaled to the measured batch
            ph1, lens1, sid1 = ph[:1], lens[:1], sid[:1]

            def one_infer(variables):
                return xla_model.apply(
                    variables, ph1, lens1, T, sid=sid1, noise_scale=0.667,
                    method=Synthesizer.infer,
                    rngs={"sample": jax.random.PRNGKey(2)},
                )[0]

            cost = xla_cost(one_infer, variables)  # compile-only
            per_iter_ms = dt / n_iters * 1e3
            mfu = roofline_row(cost["flops"] * B, cost["bytes"] * B,
                               per_iter_ms, dtype="bf16", peaks=peaks)
            mfu["chip"] = peaks["chip"]
            mfu["note"] = "flops/bytes from XLA cost analysis at B=1, x B"
    except Exception:
        import traceback

        traceback.print_exc(file=__import__("sys").stderr)
    return ("e2e_tts_throughput_audio_seconds_per_s_per_chip",
            audio_seconds / dt, mfu)


def bench_vocoder(cfg, on_tpu: bool, fused: bool = False):
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

    @jax.jit
    def loop(params, z, g, n):
        def body(i, carry):
            out = gen.apply(params, z + carry.astype(z.dtype), g, fused=fused)
            return jnp.float32(jnp.mean(out)) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    n_iters = 20 if on_tpu else 3
    dt = _timed_loop(lambda n: loop(params, z, g, n), n_iters)
    audio_seconds = n_iters * B * T * cfg.data.hop_length / cfg.data.sampling_rate
    return "vocoder_throughput_audio_seconds_per_s_per_chip", audio_seconds / dt


def main():
    import sys
    import traceback

    from vispeech_tpu.config import Config

    cfg = Config()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    extra = {}
    fallback = False
    mfu = None
    try:
        metric, value, mfu = bench_e2e(cfg, on_tpu)
    except Exception:
        # NEVER silently change what the benchmark measures: record the
        # failure loudly and mark the JSON so a broken flagship path is
        # visible in the driver artifact (round-1 lesson).
        traceback.print_exc(file=sys.stderr)
        fallback = True
        metric, value = bench_vocoder(cfg, on_tpu)
    if on_tpu:
        # vocoder XLA-vs-fused A/B so kernel wins are visible in the artifact
        for name, fused in (("vocoder_xla", False), ("vocoder_fused", True)):
            try:
                extra[name] = round(bench_vocoder(cfg, on_tpu, fused=fused)[1], 2)
            except Exception:
                traceback.print_exc(file=sys.stderr)
                extra[name] = None
    record = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "audio-s/s/chip@44.1kHz",
        "vs_baseline": round(value / BASELINE, 3),
    }
    if fallback:
        record["fallback"] = True
    if mfu is not None:
        extra["mfu"] = mfu
    if extra:
        record["extra"] = extra
    print(json.dumps(record))


if __name__ == "__main__":
    main()
