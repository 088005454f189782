#!/usr/bin/env python
"""Per-stage roofline table for the GAN train step (VERDICT r4 #4).

Joins two measurements:

* **FLOP/byte numerators** — XLA cost analysis (compile-only, no execution)
  of each stage's forward and forward+backward on the PURE-XLA kernel
  config (fused_attn/fused_wn/folded_mrf off, Pallas dispatch disabled).
  The fused kernels compute identical math, so this is the model-FLOP
  count, never inflated by kernel-internal rematerialization.
* **measured denominators** — the per-stage times of the SHIPPED fused
  configuration from benchmarks/artifacts/train_stages_{tag}.json
  (produced by bench_train_stages.py at the same (B, T)).

Output: benchmarks/artifacts/roofline_{tag}.json — per stage: GFLOPs, HBM
GB, achieved TFLOP/s, MFU %, % of the achievable roofline, bound-by
classification, speed-of-light ms, and the top-3 kernel targets ranked by
absolute headroom (measured − speed-of-light).

    python benchmarks/bench_roofline.py [--batch 12] [--frames 1024] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# must be set before the model modules import/dispatch
os.environ["VISPEECH_DISABLE_PALLAS"] = "1"

import jax
import jax.numpy as jnp

from benchmarks.bench_train_stages import _reduce, build_stage_suite


def stage_costs(fn, params, inputs):
    """XLA cost analysis of the stage fwd and (when params) fwd+bwd."""
    from vispeech_tpu.utils.flops import xla_cost

    costs = {"fwd": xla_cost(lambda i: fn(params, i), inputs)}
    if params is not None:
        def loss(params, inputs):
            return _reduce(fn(params, inputs)) * 1e30

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1), allow_int=True)
        costs["fwd_bwd"] = xla_cost(
            lambda p, i: grad_fn(p, i), params, inputs)
    return costs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--bf16", action="store_true", default=False)
    ap.add_argument("--only", default=None,
                    help="comma list of stages (chunked compile budget)")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    args = ap.parse_args()

    import dataclasses

    from vispeech_tpu.config import Config
    from vispeech_tpu.utils.flops import chip_peaks, roofline_row

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, fp16_run=args.bf16,
            # pure-XLA kernel config: the FLOP numerator
            fused_attn=False, fused_wn=False, folded_mrf=False,
        ))
    on_tpu = jax.default_backend() == "tpu"
    B = args.batch or (cfg.train.batch_size if on_tpu else 2)
    T = args.frames or (1024 if on_tpu else 32)
    tag = "bf16" if args.bf16 else "fp32"
    # measured times come from the shipped-config stage profile
    times_path = os.path.join(args.out_dir, f"train_stages_{tag}.json")
    times = {}
    if os.path.exists(times_path):
        with open(times_path) as f:
            prof = json.load(f)
        if (prof.get("batch"), prof.get("frames")) == (B, T):
            times = prof.get("stages", {})
        else:
            print(f"note: {times_path} is for shape "
                  f"({prof.get('batch')},{prof.get('frames')}) != ({B},{T}); "
                  "roofline rows will lack measured ms", file=sys.stderr)

    stages, _ = build_stage_suite(cfg, B, T)
    if args.only:
        wanted = set(args.only.split(","))
        unknown = wanted - set(stages)
        assert not unknown, f"unknown stages: {unknown}"
        stages = {k: v for k, v in stages.items() if k in wanted}

    peaks = chip_peaks()
    # the shipped train step computes in f32 (default policy); bf16 tag
    # rates against the bf16 peak
    dtype = "bf16" if args.bf16 else "f32"

    rows = {}
    for name, (fn, params, inputs) in stages.items():
        costs = stage_costs(fn, params, inputs)
        row = {}
        for mode, cost in costs.items():
            ms = (times.get(name) or {}).get(
                "fwd_ms" if mode == "fwd" else "fwd_bwd_ms")
            row[mode] = roofline_row(
                cost["flops"], cost["bytes"], ms if ms else 0.0,
                dtype=dtype, peaks=peaks)
            if not ms:
                row[mode]["ms"] = None
                row[mode]["achieved_tflops"] = None
                row[mode]["mfu_pct"] = None
                row[mode]["roofline_pct"] = None
        rows[name] = row
        print(f"{name:>12}: {json.dumps(row.get('fwd_bwd', row['fwd']))}",
              flush=True)

    # rank remaining kernel opportunities by absolute fwd+bwd headroom
    targets = []
    for name, row in rows.items():
        r = row.get("fwd_bwd")
        if r and r.get("ms"):
            targets.append({
                "stage": name,
                "headroom_ms": round(r["ms"] - r["speed_of_light_ms"], 3),
                "bound_by": r["bound_by"],
                "roofline_pct": r["roofline_pct"],
            })
    targets.sort(key=lambda t: -t["headroom_ms"])

    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"roofline_{tag}.json")
    merged_rows = rows
    if args.only and os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            if (old.get("batch"), old.get("frames")) == (B, T):
                merged_rows = {**old.get("stages", {}), **rows}
        except Exception:
            pass
    out = {
        "metric": "train_step_roofline", "tag": tag, "batch": B, "frames": T,
        "chip": peaks and peaks.get("chip"),
        "rate_dtype": dtype,
        "measured_from": times_path if times else None,
        "stages": merged_rows,
        "top_kernel_targets": targets[:3],
        "note": "flops/bytes from XLA cost analysis of the pure-XLA config; "
                "ms measured on the shipped fused config at the same shape; "
                "mfu_pct = flops/ms vs peak matmul rate, roofline_pct = "
                "speed-of-light(ms)/measured(ms) at this stage's intensity",
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
