#!/usr/bin/env python
"""Per-stage training-step breakdown at the flagship shape (the training
analogue of bench_decoder_stages.py — round-2 review: "nobody has measured
where training time actually goes").

Times each stage of the GAN step in isolation — forward, and forward+backward
(grad w.r.t. params + inputs) — at the flagship config and shape
(B=12 × 1024 frames unless overridden), plus the full fused step for cross-
checking.  Stage inputs are realistic intermediates captured from one real
forward pass; stage math mirrors Synthesizer.__call__ (models/synthesizer.py)
and train/step.py.

Timing: tunneled-TPU methodology (bench.py docstring) — every measurement is
one jitted fori_loop whose carry (a full-output reduction) perturbs the next
iteration's input by ≈0, so XLA can neither hoist nor dead-code the body;
a 1-iteration run is subtracted.

    python benchmarks/bench_train_stages.py [--fp32] [--batch 12] [--frames 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_train import make_batch


def _perturb_first_float(tree, carry):
    """Add carry·1e-30 to the first floating leaf (serializes iterations)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    done = False
    out = []
    for leaf in leaves:
        if not done and jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(leaf + carry.astype(leaf.dtype) * 1e-30)
            done = True
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _reduce(tree):
    total = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    return total * 1e-30


def timed(loop_fn, iters):
    float(loop_fn(jnp.int32(1)))
    t0 = time.perf_counter()
    float(loop_fn(jnp.int32(iters + 1)))
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    float(loop_fn(jnp.int32(1)))
    t3 = time.perf_counter()
    return max((t1 - t0) - (t3 - t2), 1e-9) / iters


def time_fn(fn, inputs, iters):
    """ms/iter for fn(inputs) under the carry-serialized fori_loop."""

    @jax.jit
    def loop(inputs, n):
        def body(i, carry):
            return _reduce(fn(_perturb_first_float(inputs, carry)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return timed(lambda n: loop(inputs, n), iters) * 1e3


def time_fwd_bwd(fn, params, inputs, iters):
    """ms/iter for value+grad of mean(fn) w.r.t. params AND float inputs."""

    def loss(params, inputs):
        return _reduce(fn(params, inputs)) * 1e30  # undo the 1e-30 for grads

    # allow_int: int leaves (phonemes/durations) get symbolic-zero grads
    grad_fn = jax.value_and_grad(loss, argnums=(0, 1), allow_int=True)

    @jax.jit
    def loop(params, inputs, n):
        def body(i, carry):
            v, (gp, gi) = grad_fn(params, _perturb_first_float(inputs, carry))
            return _reduce(gp) + _reduce(gi) + v * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    return timed(lambda n: loop(params, inputs, n), iters) * 1e3


def build_stage_suite(cfg, B: int, T: int):
    """Construct the per-stage closures + realistic inputs for the GAN step
    at (B, T).  Shared by the timing main() below and the roofline bench
    (bench_roofline.py), which runs the same stages through XLA cost
    analysis on a fused-kernels-OFF config to get the FLOP numerators.

    Returns (stages, context) where stages maps name -> (fn, params,
    inputs) with fn(params, inputs) the stage forward, and context carries
    {state, mg, md, batch, seg_frames}.
    """
    from vispeech_tpu.ops.length_regulator import length_regulate
    from vispeech_tpu.ops.masking import length_mask, slice_segments
    from vispeech_tpu.dsp import mel_spectrogram
    from vispeech_tpu.models.synthesizer import f0_to_lf0, normalize_energy
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.train.step import _cast_floats, create_train_state

    d = cfg.data
    N = max(T // 8, 8)
    seg_frames = cfg.train.segment_size // d.hop_length
    batch = make_batch(cfg, B, N, T)
    # stage applies run in TRAINING mode (deterministic=False, live dropout)
    # under the config's kernel policy — with the shipped defaults that is
    # fused attention + fused WN + folded MRF, what the real step runs
    _RNGS = {"sample": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
    state, mg, md = create_train_state(
        cfg, jax.random.PRNGKey(0), n_vocab=N_SYMBOLS, batch=batch)
    dtype = jnp.bfloat16 if cfg.train.fp16_run else jnp.float32
    params_g = _cast_floats(state.params_g, dtype)
    params_d = _cast_floats(state.params_d, dtype)
    fwd_batch = batch._replace(
        f0=batch.f0.astype(dtype), energy=batch.energy.astype(dtype),
        spec=batch.spec.astype(dtype))

    # ---- one real forward to capture realistic stage inputs ---------------
    @jax.jit
    def capture(params, b):
        def inner(m):
            g = m._speaker(b.sid)
            x, x_mask = m.enc_p(b.phonemes, b.phoneme_lengths, deterministic=False)
            lf0 = f0_to_lf0(b.f0)
            x = x + m.pitch_prenet(lf0[..., None])
            ne = normalize_energy(b.energy)
            x = x + m.energy_prenet(ne[..., None])
            z, m_q, logs_q, y_mask = m.enc_q(b.spec, b.spec_lengths, g=g,
                                             deterministic=False)
            z_p = m.flow(z, y_mask, g=g, deterministic=False)
            return dict(g=g, x=x, x_mask=x_mask, z=z, y_mask=y_mask, z_p=z_p)
        return mg.apply(params, method=inner, rngs=_RNGS)

    cap = capture(params_g, fwd_batch)
    z_slice = cap["z"][:, :seg_frames]
    wav_slice = slice_segments(batch.wav, jnp.zeros((B,), jnp.int32),
                               cfg.train.segment_size).astype(dtype)

    @jax.jit
    def dec_once(params, zs):
        return mg.apply(params, zs, cap["g"], method=lambda m, a, g: m.dec(a, g=g))

    y_hat = dec_once(params_g, z_slice)

    # ---- stage functions (mirror Synthesizer.__call__ order) --------------
    def stage_encp_heads(params, inputs):
        b = inputs

        def inner(m):
            g = m._speaker(b.sid)
            x, x_mask = m.enc_p(b.phonemes, b.phoneme_lengths, deterministic=False)
            logw = m.duration_predictor(x, x_mask, g=g, deterministic=False)
            lf0 = f0_to_lf0(b.f0)
            pred_lf0 = m.pitch_predictor(x, x_mask, g=g, deterministic=False)
            x = x + m.pitch_prenet(lf0[..., None])
            ne = normalize_energy(b.energy)
            pred_ne = m.energy_predictor(x, g=g, deterministic=False)
            x = x + m.energy_prenet(ne[..., None])
            return x, logw, pred_lf0, pred_ne
        return mg.apply(params, method=inner, rngs=_RNGS)

    def stage_lr_fpn(params, inputs):
        x, duration = inputs

        def inner(m):
            xf, fl = length_regulate(x, duration, T)
            fm = length_mask(fl, T, x.dtype)
            xf = m.frame_prior_net(xf, fm, deterministic=False)
            return m.project(xf, fm)
        return mg.apply(params, method=inner, rngs=_RNGS)

    def stage_encq(params, inputs):
        spec, lens = inputs
        return mg.apply(
            params, spec, lens,
            method=lambda m, s, sl: m.enc_q(s, sl, g=cap["g"], deterministic=False),
            rngs=_RNGS)

    def stage_flow(params, inputs):
        z, y_mask = inputs
        return mg.apply(
            params, z, y_mask,
            method=lambda m, a, ym: m.flow(a, ym, g=cap["g"], deterministic=False),
            rngs=_RNGS)

    def stage_dec(params, inputs):
        (zs,) = inputs
        return mg.apply(params, zs, cap["g"],
                        method=lambda m, a, g: m.dec(a, g=g))

    def stage_disc(params, inputs):
        real, fake = inputs
        return md.apply(params, real, fake)

    def stage_mel(params, inputs):
        (y,) = inputs
        return mel_spectrogram(
            y[..., 0].astype(jnp.float32), d.filter_length, d.n_mel_channels,
            d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax)

    stages = {
        "enc_p+heads": (stage_encp_heads, params_g, fwd_batch),
        "lr+fpn+proj": (stage_lr_fpn, params_g, (cap["x"], batch.duration)),
        "enc_q": (stage_encq, params_g, (fwd_batch.spec, batch.spec_lengths)),
        "flow": (stage_flow, params_g, (cap["z"], cap["y_mask"])),
        "dec_slice": (stage_dec, params_g, (z_slice,)),
        "disc": (stage_disc, params_d, (wav_slice, y_hat)),
        "mel_slice": (stage_mel, None, (y_hat,)),
    }
    context = dict(state=state, mg=mg, md=md, batch=batch,
                   seg_frames=seg_frames)
    return stages, context


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    # default = the SHIPPED training policy (config.TrainConfig: f32 +
    # fused attention/WN/folded-MRF all on) — round-3 review: the profile
    # must describe the configuration that actually trains
    ap.add_argument("--bf16", action="store_true", default=False,
                    help="profile the (non-default, diverging) bf16 policy")
    ap.add_argument("--only", default=None,
                    help="comma list of stage names to run THIS invocation "
                         "(chunked profiling: each chunk fits a driver "
                         "timeout; results merge into the same artifact)")
    ap.add_argument("--skip-full-step", action="store_true",
                    help="skip the full-step cross-check (its compile alone "
                         "is multi-minute; the stage numbers stand on their "
                         "own)")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    args = ap.parse_args()

    import dataclasses

    from vispeech_tpu.config import Config
    from vispeech_tpu.train.step import make_train_step

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fp16_run=args.bf16))
    on_tpu = jax.default_backend() == "tpu"
    B = args.batch or (cfg.train.batch_size if on_tpu else 2)
    T = args.frames or (1024 if on_tpu else 32)
    iters = args.iters if on_tpu else 2
    tag = "bf16" if args.bf16 else "fp32"

    stages, ctx = build_stage_suite(cfg, B, T)
    state, mg, md = ctx["state"], ctx["mg"], ctx["md"]
    batch, seg_frames = ctx["batch"], ctx["seg_frames"]
    if args.only:
        wanted = set(args.only.split(","))
        unknown = wanted - set(stages)
        assert not unknown, f"unknown stages: {unknown}"
        stages = {k: v for k, v in stages.items() if k in wanted}

    results = {}
    for name, (fn, params, inputs) in stages.items():
        fwd_ms = time_fn(lambda i, f=fn, p=params: f(p, i), inputs, iters)
        row = {"fwd_ms": round(fwd_ms, 2)}
        if params is not None:
            row["fwd_bwd_ms"] = round(time_fwd_bwd(fn, params, inputs, iters), 2)
        results[name] = row
        print(f"{name:>12}: {row}", flush=True)

    # ---- full step cross-check --------------------------------------------
    if not args.skip_full_step and not args.only:
        step_fn = make_train_step(cfg, mg, md)

        @jax.jit
        def step_loop(state, b, n):
            def body(i, st):
                return step_fn(st, b)[0]
            final = jax.lax.fori_loop(0, n, body, state)
            return step_fn(final, b)[1]["loss/g/total"]

        dt = timed(lambda n: step_loop(state, batch, n), iters)
        results["full_step"] = {"ms": round(dt * 1e3, 2),
                                "steps_per_s": round(1.0 / dt, 3)}
        print(f"   full_step: {results['full_step']}", flush=True)

    # merge into the artifact: chunked invocations (--only) accumulate
    # rows; a shape/tag change resets the file
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"train_stages_{tag}.json")
    merged = {}
    if args.only and os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            if (old.get("batch"), old.get("frames"), old.get("tag")) == (B, T, tag):
                merged = old.get("stages", {})
        except Exception:
            pass
    merged.update(results)

    bwd_sum = sum(r.get("fwd_bwd_ms", r["fwd_ms"]) for k, r in merged.items()
                  if k != "full_step" and r)
    out = {
        "metric": "train_stage_breakdown", "tag": tag, "batch": B, "frames": T,
        "segment_frames": seg_frames, "backend": jax.default_backend(),
        "kernels": {"fused_attn": cfg.train.fused_attn,
                    "fused_wn": cfg.train.fused_wn,
                    "folded_mrf": cfg.train.folded_mrf},
        "stages": merged,
        "stage_sum_fwd_bwd_ms": round(bwd_sum, 2),
        "note": "stage fwd_bwd includes grads wrt params+inputs; full_step "
                "additionally runs D twice (updated-D G loss), both "
                "optimizers, and shares one G forward via vjp",
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
