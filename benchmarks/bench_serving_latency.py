#!/usr/bin/env python
"""Serving latency + realistic-shape throughput (round-2 review items (a)+(b)).

(a) Per-request latency at B=1 — wall time from host input to the audio
    ndarray on the host (device_get forces the transfer, the only reliable
    sync on the tunneled TPU), per frame bucket; p50/p95 over many requests.
    This is the number the reference printed per request
    (reference inference_api.py:43-54) and bench.py's batch throughput hides.

(b) Throughput under a sampled utterance-length distribution routed through
    the REAL bucket path (infer/pipeline._pick_bucket): requests are
    bucketed, batched (≤ --batch per bucket, dummy-padded tail batches),
    and every batch is synthesized + fetched; reports EFFECTIVE
    audio-seconds/s (real frames only) and padding efficiency — the number
    the bucket design (data/dataset.py:14-18) exists to keep high.

    python benchmarks/bench_serving_latency.py [--requests 256] [--batch 16]
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


def build_infer(cfg, B: int, T: int, int16: bool = False):
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
    def infer(variables, ph, lens, sid, seed):
        out = model.apply(
            variables, ph, lens, T, sid=sid, noise_scale=0.667,
            method=type(model).infer,
            rngs={"sample": jax.random.fold_in(jax.random.PRNGKey(3), seed)},
        )
        audio = out[0]
        if int16:  # the engine's device-side PCM quantization (pipeline.py)
            audio = jnp.round(
                jnp.clip(audio[..., 0].astype(jnp.float32), -1.0, 1.0)
                * 32767.0
            ).astype(jnp.int16)
        # return EXACTLY what TTSEngine's jitted fn returns (pipeline.py
        # _get_infer_fn: audio, frame_mask, duration, f0, energy — latents
        # dropped inside the jit) so the benchmark fetches the same bytes
        # as production serving
        return audio, out[1], out[3], out[4], out[5]

    return model, variables, infer, N


def bench_latency(cfg, buckets, n_requests: int, int16: bool = False):
    """B=1 per-request wall-clock (ms) incl. host transfer, per bucket."""
    out = {}
    for T in buckets:
        model, variables, infer, N = build_infer(cfg, 1, T, int16=int16)
        rng = np.random.RandomState(1)
        # warm (compile) — not timed
        outs = infer(variables, jnp.asarray(rng.randint(1, 500, (1, N)),
                                            jnp.int32),
                     jnp.full((1,), N, jnp.int32), jnp.zeros((1,), jnp.int32),
                     jnp.int32(0))
        jax.device_get(outs)
        times = []
        for i in range(n_requests):
            ph_host = rng.randint(1, 500, (1, N)).astype(np.int32)
            t0 = time.perf_counter()
            outs = infer(
                variables, jnp.asarray(ph_host), jnp.full((1,), N, jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.int32(i))
            jax.device_get(outs)  # full production fetch = sync
            times.append((time.perf_counter() - t0) * 1e3)
        times = np.asarray(times)
        audio_s = T * cfg.data.hop_length / cfg.data.sampling_rate
        out[T] = {
            "p50_ms": round(float(np.percentile(times, 50)), 2),
            "p95_ms": round(float(np.percentile(times, 95)), 2),
            "audio_seconds": round(audio_s, 2),
            "rtf_p50": round(float(np.percentile(times, 50)) / 1e3 / audio_s, 4),
            "n": len(times),
        }
        print(json.dumps({"latency_bucket": T, **out[T]}), flush=True)
    return out


def bench_distribution(cfg, n_requests: int, batch: int, seed: int = 0,
                       tiered: bool = True, int16: bool = False,
                       pipelined: bool = False):
    """Throughput + padding efficiency for a sampled length distribution.

    ``tiered=True`` routes requests through the production planner
    (infer/batching.py: batch tiers + 64-frame serving buckets);
    ``tiered=False`` reproduces round 3's single-tier/coarse-bucket policy
    for the A/B.  Compute time (block_until_ready) and host-transfer time
    (device_get) are accounted separately so the tunnel artifact of this
    environment no longer pollutes the architecture signal.
    """
    from vispeech_tpu.infer.batching import (
        DEFAULT_TIERS, SERVING_BUCKETS, plan_batches, plan_stats,
    )

    coarse = (64, 128, 256, 384, 512, 640, 768, 896, 1024, 1152, 1280, 1400)
    buckets = SERVING_BUCKETS if tiered else coarse
    tiers = DEFAULT_TIERS if tiered else (batch,)
    if batch < 16:  # CPU smoke shrinks the tier set too
        tiers = tuple(t for t in tiers if t <= batch) or (batch,)

    rng = np.random.RandomState(seed)
    # lognormal utterance lengths clipped to the reference's [32, 1400] range
    frames = np.clip(np.exp(rng.normal(6.2, 0.55, n_requests)), 48, 1400)
    frames = frames.astype(np.int32)
    plans = plan_batches(frames, buckets, tiers)
    stats = plan_stats(plans, frames)

    fns = {}
    for key in sorted({(p.bucket, p.tier) for p in plans}):
        T, B = key
        fns[key] = build_infer(cfg, B, T, int16=int16)
        model, variables, infer, N = fns[key]  # warm/compile, untimed
        outs = infer(variables, jnp.ones((B, N), jnp.int32),
                     jnp.full((B,), N, jnp.int32),
                     jnp.zeros((B,), jnp.int32), jnp.int32(0))
        jax.device_get(outs)

    compute_s = 0.0
    transfer_s = 0.0
    t0 = time.perf_counter()
    if pipelined:
        # the engine's depth-1 software pipeline (pipeline.synthesize_batch):
        # batch k+1 is dispatched before batch k's audio is fetched, so the
        # device computes under the host transfer.  compute/transfer can't
        # be accounted separately here — they overlap by design.
        pending = None
        for i, p in enumerate(plans):
            model, variables, infer, N = fns[(p.bucket, p.tier)]
            ph = np.ones((p.tier, N), np.int32)
            outs = infer(
                variables, jnp.asarray(ph), jnp.full((p.tier,), N, jnp.int32),
                jnp.zeros((p.tier,), jnp.int32), jnp.int32(i))
            if pending is not None:
                jax.device_get(pending)
            pending = outs
        if pending is not None:
            jax.device_get(pending)
    else:
        for i, p in enumerate(plans):
            model, variables, infer, N = fns[(p.bucket, p.tier)]
            ph = np.ones((p.tier, N), np.int32)
            t1 = time.perf_counter()
            outs = infer(
                variables, jnp.asarray(ph), jnp.full((p.tier,), N, jnp.int32),
                jnp.zeros((p.tier,), jnp.int32), jnp.int32(i))
            jax.block_until_ready(outs)
            t2 = time.perf_counter()
            jax.device_get(outs)
            t3 = time.perf_counter()
            compute_s += t2 - t1
            transfer_s += t3 - t2
    dt = time.perf_counter() - t0

    hop, sr = cfg.data.hop_length, cfg.data.sampling_rate
    real_audio_s = float(frames.sum()) * hop / sr
    padded_audio_s = stats["slot_frames"] * hop / sr
    hist: dict = {}
    for p in plans:
        hist[p.bucket] = hist.get(p.bucket, 0) + len(p.indices)
    policy = "tiered+fine-buckets" if tiered else "single-tier+coarse (round-3)"
    if int16:
        policy += "+int16-transfer"
    if pipelined:
        policy += "+pipelined"
    return {
        "requests": n_requests,
        "policy": policy,
        "tiers": list(tiers),
        "n_batches": stats["n_batches"],
        "dummy_rows": stats["dummy_rows"],
        "bucket_histogram": {str(k): v for k, v in sorted(hist.items())},
        "effective_audio_s_per_s": round(real_audio_s / dt, 1),
        "effective_audio_s_per_s_compute_only": round(
            real_audio_s / compute_s, 1) if compute_s else None,
        "padded_audio_s_per_s": round(padded_audio_s / dt, 1),
        "padding_efficiency": round(real_audio_s / padded_audio_s, 4),
        "compute_s": round(compute_s, 2) if not pipelined else None,
        "host_transfer_s": round(transfer_s, 2) if not pipelined else None,
        "overlapped": bool(pipelined),
        "wall_s": round(dt, 2),
    }


ALL_MODES = ("lat", "lat16", "r4", "tiered", "r3")
MODE_KEY = {"lat": "latency_b1", "lat16": "latency_b1_int16",
            "r4": "distribution", "tiered": "distribution_no_overlap",
            "r3": "distribution_round3_policy"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--latency-requests", type=int, default=50)
    ap.add_argument("--buckets", default="256,512,1024,1408")
    ap.add_argument("--modes", default="all",
                    help="comma list of lat,lat16,r4,tiered,r3 — unlisted "
                         "sections are carried over from the existing "
                         "artifact (bounds compile time per invocation)")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    args = ap.parse_args()

    # compile once per shape across invocations of this harness —
    # user-scoped path (a shared world-writable /tmp dir collides between
    # users on a shared host); override with VISPEECH_JAX_CACHE
    cache_dir = os.environ.get("VISPEECH_JAX_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "vispeech", "jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vispeech_tpu.config import Config

    cfg = Config()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:  # CPU smoke: shrink everything
        args.requests, args.batch, args.latency_requests = 8, 2, 3
        args.buckets = "64"
    modes = ALL_MODES if args.modes == "all" else tuple(
        args.modes.split(","))
    unknown = [m for m in modes if m not in ALL_MODES]
    if unknown:
        ap.error(f"unknown --modes {unknown}; valid: {','.join(ALL_MODES)}")

    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, "serving_latency.json")
    out = {"metric": "serving_latency_and_distribution",
           "backend": backend}
    if os.path.exists(path):  # carry over sections not re-run this time
        with open(path) as f:
            prior = json.load(f)
        for key in MODE_KEY.values():
            if key in prior:
                sec = prior[key]
                # sections are backend-stamped; refuse to silently mix a
                # CPU smoke run into a TPU artifact (or vice versa)
                sec_backend = (sec.get("backend")
                               if isinstance(sec, dict) else None) \
                    or prior.get("backend")
                if sec_backend is not None and sec_backend != backend:
                    print(f"dropping stale section {key!r}: backend "
                          f"{sec_backend!r} != current {backend!r}",
                          file=sys.stderr)
                    continue
                out[key] = sec

    lat_buckets = [int(x) for x in args.buckets.split(",")]
    if "lat" in modes:
        out["latency_b1"] = bench_latency(
            cfg, lat_buckets, args.latency_requests)
    if "lat16" in modes:
        # serving default on TPU is int16 transfer (TTSEngine.transfer_int16)
        # — measure the per-request latency it buys over the f32 fetch
        out["latency_b1_int16"] = bench_latency(
            cfg, lat_buckets, args.latency_requests, int16=True)
    if "r4" in modes:
        # round-4 production policy: tiered buckets + int16 transfer +
        # depth-1 fetch/compute pipeline (TTSEngine.synthesize_batch)
        out["distribution"] = bench_distribution(
            cfg, args.requests, args.batch, tiered=True,
            int16=True, pipelined=True)
        print(json.dumps(out["distribution"]), flush=True)
    if "tiered" in modes:
        out["distribution_no_overlap"] = bench_distribution(
            cfg, args.requests, args.batch, tiered=True)
        print(json.dumps(out["distribution_no_overlap"]), flush=True)
    if "r3" in modes:
        out["distribution_round3_policy"] = bench_distribution(
            cfg, args.requests, args.batch, tiered=False)
        print(json.dumps(out["distribution_round3_policy"]), flush=True)

    # stamp every freshly produced section with the backend it ran on, so
    # the carry-over merge above can detect cross-backend staleness
    for key in MODE_KEY.values():
        if key in out and isinstance(out[key], dict):
            out[key]["backend"] = backend

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
