#!/usr/bin/env python
"""Round-4 directive #2: root-cause the bf16 GAN collapse.

Round 3 measured that EVERY bf16 training scope eventually diverges
(BENCH_TRAIN_r03.json convergence matrix: "full" @ ~120 steps, "stable"
@ ~1450) while fp32 converges, but the mechanism was unknown.  This
harness localizes it two ways:

  --mode stages   one overfit run per SINGLE bf16 stage
                  (enc_p / heads / fpn / project / enc_q / flow / dec via
                  cfg.train.bf16_only + Synthesizer.bf16_stages boundary
                  casts): which stage alone, computing in bf16 with
                  everything else f32, reproduces the collapse?
  --mode trace    fp32 vs bf16-stable runs with periodic instrumented
                  forwards (flax capture_intermediates): per-module
                  max|activation| time series — where does amplitude
                  growth enter first, and does the decoder pre-tanh rail?

Both write JSON artifacts under benchmarks/artifacts/bf16_diag/.

The reference trains its whole step in fp16 + GradScaler
(reference train.py:124,168,207); bf16 has fp32 exponent range, so any
divergence here is a mantissa/rounding effect, not underflow — the point
of localizing it per stage.

Usage:
    python benchmarks/bench_bf16_diag.py --mode stages --steps 2000
    python benchmarks/bench_bf16_diag.py --mode trace  --steps 1500
    python benchmarks/bench_bf16_diag.py --mode stages --stages flow+enc_q
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

ALL_STAGES = ("enc_p", "heads", "fpn", "project", "enc_q", "flow", "dec")


def build(cfg, workspace):
    """Dataset + fixed batch + train state + jitted step, shared per run."""
    import jax
    import jax.numpy as jnp

    from vispeech_tpu.data.dataset import FilelistDataset, collate
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.train.step import Batch, create_train_state, make_train_step

    ds = FilelistDataset(cfg.data.training_files, cfg.data,
                         data_root=os.path.join(workspace, "dataset"))
    frames = [u.n_frames for u in ds.utterances]
    budget = int(np.ceil(max(frames) / 32) * 32)
    idx = list(range(min(cfg.train.batch_size, len(ds))))
    raw = collate(ds, idx, frame_budget=budget)
    batch = Batch(**{k: jnp.asarray(v) for k, v in raw.items()})
    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), N_SYMBOLS, batch)
    step_fn = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)
    return batch, state, mg, step_fn


def make_probe(cfg, model_g, batch):
    """Jitted instrumented forward: per-module max|activation| under the
    run's exact precision policy (g_param_cast + stage boundary casts)."""
    import jax
    import jax.numpy as jnp

    from vispeech_tpu.train.step import g_param_cast

    cast = g_param_cast(cfg)
    bf16_only = bool(cfg.train.bf16_only)

    def probe(params_g):
        gp = cast(params_g["params"])
        fwd_batch = batch
        if cfg.train.fp16_run and not bf16_only:
            fwd_batch = batch._replace(
                f0=batch.f0.astype(jnp.bfloat16),
                energy=batch.energy.astype(jnp.bfloat16),
                spec=batch.spec.astype(jnp.bfloat16),
            )
        _, inter = model_g.apply(
            {"params": gp},
            fwd_batch.phonemes, fwd_batch.phoneme_lengths, fwd_batch.f0,
            fwd_batch.energy, fwd_batch.duration, fwd_batch.spec,
            fwd_batch.spec_lengths, fwd_batch.sid,
            deterministic=True,
            rngs={"sample": jax.random.PRNGKey(0)},
            capture_intermediates=True,
        )
        stats = {}
        flat = jax.tree_util.tree_flatten_with_path(
            inter["intermediates"])[0]
        for path, leaf in flat:
            if not (hasattr(leaf, "dtype")
                    and jnp.issubdtype(leaf.dtype, jnp.floating)):
                continue
            name = "/".join(
                getattr(p, "key", getattr(p, "idx", "?")).__str__()
                for p in path if getattr(p, "key", None) != "__call__"
            )
            m = jnp.max(jnp.abs(leaf.astype(jnp.float32)))
            # a module can appear multiple times (tuple outputs): keep max
            stats[name] = jnp.maximum(stats.get(name, jnp.float32(0)), m)
        return stats

    return jax.jit(probe)


def run_one(tag, cfg, workspace, steps, log_every, probe_every=0):
    import jax

    t0 = time.time()
    batch, state, mg, step_fn = build(cfg, workspace)
    probe_fn = make_probe(cfg, mg, batch) if probe_every else None

    hist = {"step": [], "mel": [], "d": [], "gnorm_g": []}
    probes = []
    collapse_step = None
    mel_init = None
    for i in range(steps):
        if probe_fn is not None and i % probe_every == 0:
            probes.append(
                {"step": i,
                 **{k: float(v) for k, v in
                    jax.device_get(probe_fn(state.params_g)).items()}})
        state, m = step_fn(state, batch)
        if i % log_every == 0 or i == steps - 1:
            m = jax.device_get(m)
            mel = float(m["loss/g/mel"])
            if mel_init is None:
                mel_init = mel
            hist["step"].append(i)
            hist["mel"].append(round(mel, 3))
            hist["d"].append(round(float(m["loss/d/total"]), 3))
            hist["gnorm_g"].append(round(float(m["grad_norm_g"]), 3))
            if collapse_step is None and i > 100 and mel > 1.2 * mel_init:
                collapse_step = i
            if not np.isfinite(mel):
                collapse_step = collapse_step or i
                print(f"[{tag}] step {i}: non-finite mel, stopping", flush=True)
                break
    mel_final = float(np.mean(hist["mel"][-5:]))
    out = {
        "tag": tag,
        "steps": int(hist["step"][-1]) + 1,
        "mel_initial": round(mel_init, 3),
        "mel_final": round(mel_final, 3),
        "mel_ratio": round(mel_final / mel_init, 4),
        "collapsed": collapse_step is not None,
        "collapse_step": collapse_step,
        "d_final": hist["d"][-1],
        "wall_s": round(time.time() - t0, 1),
        "history": hist,
    }
    if probes:
        out["probes"] = probes
    print(f"[{tag}] mel {out['mel_initial']} -> {out['mel_final']} "
          f"(x{out['mel_ratio']}), collapsed={out['collapsed']} "
          f"@{collapse_step}, {out['wall_s']}s", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("stages", "trace"), default="stages")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--stages", default=None,
                   help="'+'-joined subset for --mode stages "
                        "(default: each single stage in turn)")
    p.add_argument("--trace-scopes", default="fp32,bf16_stable,bf16_full",
                   help="comma subset for --mode trace")
    p.add_argument("--fused", action="store_true",
                   help="run with the fused training kernels ON "
                        "(attention/WN/folded-MRF) instead of the XLA paths "
                        "— isolates kernel-vs-precision interactions")
    p.add_argument("--bf16-disc", action="store_true",
                   help="discriminators in bf16 too (cfg.train.bf16_disc)")
    p.add_argument("--probe", action="store_true",
                   help="enable capture_intermediates amplitude probes in "
                        "trace mode (XLA paths only)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--probe-every", type=int, default=50)
    p.add_argument("--workspace", default="/tmp/vispeech_convergence")
    p.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "bf16_diag"))
    args = p.parse_args()

    from bench_convergence import flagship_config
    from vispeech_tpu.data.synthetic import write_synthetic_dataset

    os.makedirs(args.out_dir, exist_ok=True)
    write_synthetic_dataset(
        args.workspace, sr=44100, hop=512, n_utts=8, n_phones=24,
        dur_range=(4, 10), seed=0,
    )

    import dataclasses

    def cfg_for(fp16, bf16_only=(), scope="stable"):
        cfg = flagship_config(args.workspace, fp16, args.batch, args.lr,
                              bf16_scope=scope,
                              fused_attn=args.fused)
        return dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, bf16_only=tuple(bf16_only),
                fused_wn=args.fused, folded_mrf=args.fused,
                bf16_disc=args.bf16_disc,
            )
        )

    fused_sfx = ("_fused" if args.fused else "") + (
        "_d16" if args.bf16_disc else "")
    if args.mode == "stages":
        stage_sets = ([tuple(args.stages.split("+"))] if args.stages
                      else [(s,) for s in ALL_STAGES])
        results = []
        for ss in stage_sets:
            tag = "only_" + "+".join(ss) + fused_sfx
            results.append(run_one(tag, cfg_for(True, bf16_only=ss),
                                   args.workspace, args.steps, args.log_every))
            path = os.path.join(args.out_dir, f"stage_matrix{fused_sfx}.json")
            with open(path, "w") as f:
                json.dump({"mode": "stages", "steps": args.steps,
                           "results": results}, f)
        print(f"wrote {path}", flush=True)
        print("\nstage → collapsed?")
        for r in results:
            print(f"  {r['tag']:24s} mel x{r['mel_ratio']:8.3f} "
                  f"collapsed={r['collapsed']} @{r['collapse_step']}")
    else:
        all_scopes = {
            "fp32": lambda: cfg_for(False),
            "bf16_stable": lambda: cfg_for(True),
            "bf16_full": lambda: cfg_for(True, scope="full"),
        }
        for name in args.trace_scopes.split(","):
            tag = name + fused_sfx
            out = run_one(tag, all_scopes[name](), args.workspace, args.steps,
                          args.log_every,
                          probe_every=args.probe_every if args.probe else 0)
            path = os.path.join(args.out_dir, f"trace_{tag}.json")
            with open(path, "w") as f:
                json.dump(out, f)
            print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
