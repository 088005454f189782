#!/usr/bin/env python
"""Flagship-scale overfit run: proof the GAN training loop LEARNS.

The reference demonstrates its training loop by training real voices
(reference train.py:139-266); this harness provides the equivalent evidence
on TPU without a corpus: the flagship architecture (reference
configs/config.json — 192 hidden, 768 filter, 4-layer encoders, k 3/7/11,
16-layer WN posterior, rates 8·8·4·2 at 44.1 kHz) overfits a small fixed
synthetic dataset (data/synthetic.py) and the loss trajectory is recorded.

Outputs (into --out-dir, default benchmarks/artifacts):
  * convergence_{tag}.json — sampled loss curves + summary ratios + steps/s
  * convergence_{tag}_losses.png — mel/dur/pitch/D curves
  * convergence_{tag}_mel.png — GT vs generated mel after training

Usage:
    python benchmarks/bench_convergence.py --steps 1500            # fp32
    python benchmarks/bench_convergence.py --steps 1500 --bf16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def flagship_config(root: str, fp16: bool, batch_size: int, lr: float,
                    bf16_scope: str = "tail_f32", fused_attn: bool = True,
                    bf16_disc: bool = False):
    from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

    return Config(
        train=TrainConfig(
            seed=0, batch_size=batch_size, fp16_run=fp16, segment_size=16384,
            learning_rate=lr, bf16_scope=bf16_scope, fused_attn=fused_attn,
            bf16_disc=bf16_disc,
            # this harness IS the A/B diagnostic tool for the legacy scopes
            bf16_allow_divergent=bf16_scope in ("stable", "full"),
        ),
        data=DataConfig(
            training_files=os.path.join(root, "train.list"),
            validation_files=os.path.join(root, "val.list"),
            sampling_rate=44100, filter_length=2048, hop_length=512,
            win_length=2048, n_mel_channels=80, n_speakers=200,
            spk2id=(("spk0", 0), ("spk1", 1)),
        ),
        model=ModelConfig(),  # flagship defaults = reference config.json
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--bf16", action="store_true",
                   help="run the bf16 policy (train.fp16_run, shipped "
                        "'tail_f32' scope: decoder tail + discriminators f32)")
    p.add_argument("--bf16-stable", action="store_true",
                   help="legacy round-3 'stable' scope (diverges slowly; "
                        "A/B only)")
    p.add_argument("--bf16-full", action="store_true",
                   help="everything-bf16 scope (known to destabilize the GAN; "
                        "kept for A/B — see config.TrainConfig.bf16_scope)")
    p.add_argument("--bf16-disc", action="store_true",
                   help="discriminators in bf16 (composes with tail_f32; "
                        "the fastest measured converging config)")
    p.add_argument("--no-fused-attn", dest="fused_attn", action="store_false",
                   default=True,
                   help="XLA training attention (A/B vs the fused kernel)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--utts", type=int, default=8)
    p.add_argument("--phones", type=int, default=24)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    p.add_argument("--workspace", default="/tmp/vispeech_convergence")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vispeech_tpu.data.dataset import FilelistDataset, collate
    from vispeech_tpu.data.synthetic import write_synthetic_dataset
    from vispeech_tpu.dsp import mel_spectrogram, spec_to_mel
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.train.step import Batch, create_train_state, make_train_step

    if args.bf16_full or args.bf16_stable:
        args.bf16 = True
    scope = ("full" if args.bf16_full
             else "stable" if args.bf16_stable else "tail_f32")
    tag = (f"bf16_{scope}" if scope != "tail_f32" else "bf16") \
        if args.bf16 else "fp32"
    if args.bf16_disc:
        tag += "_disc"
    if not args.fused_attn:
        tag += "_xla_attn"
    os.makedirs(args.out_dir, exist_ok=True)
    root = args.workspace
    write_synthetic_dataset(
        root, sr=44100, hop=512, n_utts=args.utts, n_phones=args.phones,
        dur_range=(4, 10), seed=0,
    )
    cfg = flagship_config(root, args.bf16, args.batch, args.lr,
                          bf16_scope=scope, fused_attn=args.fused_attn,
                          bf16_disc=args.bf16_disc)
    d = cfg.data

    ds = FilelistDataset(cfg.data.training_files, cfg.data,
                         data_root=os.path.join(root, "dataset"))
    frames = [u.n_frames for u in ds.utterances]
    budget = int(np.ceil(max(frames) / 32) * 32)
    idx = list(range(min(args.batch, len(ds))))
    raw = collate(ds, idx, frame_budget=budget)
    batch = Batch(**{k: jnp.asarray(v) for k, v in raw.items()})
    print(f"[{tag}] dataset: {len(ds)} utts, frames {min(frames)}-{max(frames)}, "
          f"budget {budget}; batch {len(idx)}; backend={jax.default_backend()}",
          flush=True)

    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), N_SYMBOLS, batch)
    step_fn = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)

    keys = ("loss/g/mel", "loss/g/dur", "loss/g/pitch", "loss/g/energy",
            "loss/g/kl", "loss/g/fm", "loss/g/gen", "loss/d/total")
    hist = {k: [] for k in keys}
    hist["step"] = []

    t_compile = time.time()
    state, m = step_fn(state, batch)
    m = jax.device_get(m)  # forces completion
    print(f"[{tag}] first step (compile) {time.time()-t_compile:.1f}s", flush=True)

    t0 = time.time()
    for i in range(1, args.steps):
        state, m = step_fn(state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            m = jax.device_get(m)
            hist["step"].append(i)
            for k in keys:
                hist[k].append(float(m[k]))
            if i % (args.log_every * 20) == 0 or i == args.steps - 1:
                print(f"[{tag}] step {i:5d} mel={m['loss/g/mel']:.3f} "
                      f"dur={m['loss/g/dur']:.3f} pitch={m['loss/g/pitch']:.4f} "
                      f"d={m['loss/d/total']:.3f}", flush=True)
    jax.block_until_ready(state.params_g)
    dt = time.time() - t0
    steps_per_sec = (args.steps - 1) / dt

    mel0 = float(np.mean(hist["loss/g/mel"][:2]))
    mel1 = float(np.mean(hist["loss/g/mel"][-5:]))
    summary = {
        "tag": tag,
        "steps": args.steps,
        "steps_per_sec": round(steps_per_sec, 3),
        "mel_initial": round(mel0, 3),
        "mel_final": round(mel1, 3),
        "mel_ratio": round(mel1 / mel0, 4),
        "dur_initial": round(float(np.mean(hist["loss/g/dur"][:2])), 3),
        "dur_final": round(float(np.mean(hist["loss/g/dur"][-5:])), 3),
        "pitch_initial": round(float(np.mean(hist["loss/g/pitch"][:2])), 4),
        "pitch_final": round(float(np.mean(hist["loss/g/pitch"][-5:])), 4),
        "d_final": round(float(np.mean(hist["loss/d/total"][-5:])), 3),
        "batch": len(idx),
        "frame_budget": budget,
        "backend": jax.default_backend(),
        "config": "flagship (reference configs/config.json architecture)",
    }
    print(f"[{tag}] {summary}", flush=True)

    # ---- teacher-forced GT vs generated mel after training ----------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    u = ds.utterances[0]
    n_ph = len(u.phonemes)
    t_frames = int(u.duration.sum())

    def gen_fn(params, phonemes, lengths, dur, f0, energy, sid):
        return mg.apply(
            params, phonemes, lengths, t_frames, sid=sid, noise_scale=0.0,
            duration_control=dur, pitch_control=f0, energy_control=energy,
            method=type(mg).infer,
            rngs={"sample": jax.random.PRNGKey(0)},
        )

    audio, *_ = jax.jit(gen_fn)(
        state.params_g,
        jnp.asarray(u.phonemes[None]), jnp.asarray([n_ph], jnp.int32),
        jnp.asarray(u.duration[None].astype(np.float32)),
        jnp.asarray(u.f0[None]), jnp.asarray(u.energy[None]),
        jnp.asarray([u.sid], jnp.int32),
    )
    wav_gen = np.asarray(jax.device_get(audio))[0, :, 0]
    spec_gt, wav_gt = ds.load_audio(u)
    mel_gt = np.asarray(jax.device_get(spec_to_mel(
        jnp.asarray(spec_gt[None]), d.filter_length, d.n_mel_channels,
        d.sampling_rate, d.mel_fmin, d.mel_fmax)))[0]
    mel_gen = np.asarray(jax.device_get(mel_spectrogram(
        jnp.asarray(wav_gen[None]), d.filter_length, d.n_mel_channels,
        d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax)))[0]
    n = min(mel_gt.shape[0], mel_gen.shape[0])
    summary["mel_l1_teacher_forced"] = round(
        float(np.mean(np.abs(mel_gt[:n] - mel_gen[:n]))), 4)

    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
    for ax, mel, name in ((axes[0], mel_gt[:n], "ground truth"),
                          (axes[1], mel_gen[:n], f"generated after {args.steps} steps")):
        ax.imshow(mel.T, aspect="auto", origin="lower", interpolation="none")
        ax.set_title(f"{name} mel ({tag})")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, f"convergence_{tag}_mel.png"), dpi=100)
    plt.close(fig)

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    panels = (
        ("loss/g/mel", "mel L1 ×45"), ("loss/g/dur", "duration MSE"),
        ("loss/g/pitch", "pitch MSE"), ("loss/d/total", "discriminator"),
    )
    for ax, (k, title) in zip(axes.flat, panels):
        ax.plot(hist["step"], hist[k])
        ax.set_title(title)
        ax.set_xlabel("step")
        if min(hist[k]) > 0:
            ax.set_yscale("log")
    fig.suptitle(f"flagship overfit ({tag}): mel {mel0:.2f} → {mel1:.2f} "
                 f"({summary['mel_ratio']:.2%}), {steps_per_sec:.2f} steps/s")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, f"convergence_{tag}_losses.png"), dpi=100)
    plt.close(fig)

    out = {"summary": summary, "history": hist}
    path = os.path.join(args.out_dir, f"convergence_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
