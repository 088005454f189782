#!/usr/bin/env python
"""Round-4 directive #1: the REAL training system, end-to-end, on the chip.

Every prior TPU training number drove `make_train_step` from a harness;
this runs `python train.py` (the actual CLI → Trainer: filelist dataset,
bucketed mixed-length batches, prefetch thread, eval loop, TensorBoard,
async checkpointing, SIGTERM preemption + resume) at the flagship
architecture on a production-shape synthetic corpus whose frame lengths
span the bucket range up to T≥1024 — the regime the reference's train.py
actually operated in (reference train.py:42-339, data_utils.py:219-318).

Phases:
  1. corpus prep: mixed-length synthetic dataset + spec-cache prewarm
  2. run 1: `train.py --max-steps <kill-at>̃`…  actually run 1 goes to
     ~60% of the target, then we SIGTERM it mid-flight (preemption drill),
     verify the clean checkpoint-and-exit, and
  3. run 2: relaunch the same command line — it must RESUME from the
     preemption checkpoint and keep descending to --steps.
  4. aggregate: loss curves (train.log), per-bucket step times
     (train_stats.json), compile counts, pipeline overhead vs the
     bare-step harness number (bench_train.py at B=12×1024).

Output: benchmarks/artifacts/trainer_e2e.json (+ loss-curve png).

Usage:  python benchmarks/bench_trainer_e2e.py --steps 1500
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

LOG_RE = re.compile(
    r"epoch (\d+) step (\d+): g=([\d.nan]+) d=([\d.nan]+) mel=([\d.nan]+) "
    r"\(([\d.]+) steps/s\)"
)


def write_config(root: str, save_dir: str, batch_size: int,
                 bf16: bool = False, bf16_disc: bool = False) -> str:
    """Flagship config (reference configs/config.json architecture) over the
    synthetic corpus."""
    import dataclasses

    from vispeech_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig, save_config,
    )

    cfg = Config(
        train=TrainConfig(
            seed=0, batch_size=batch_size, fp16_run=bf16,
            bf16_disc=bf16_disc,
            segment_size=16384, learning_rate=2e-4,
            log_interval=25, eval_interval=500, epochs=100_000,
            save_dir=save_dir,
        ),
        data=DataConfig(
            training_files=os.path.join(root, "train.list"),
            validation_files=os.path.join(root, "val.list"),
            sampling_rate=44100, filter_length=2048, hop_length=512,
            win_length=2048, n_mel_channels=80, n_speakers=200,
            spk2id=(("spk0", 0), ("spk1", 1)),
        ),
        model=ModelConfig(),
    )
    path = os.path.join(root, "config.json")
    save_config(cfg, path)
    return path


def prep_corpus(root: str, n_utts: int) -> dict:
    """Mixed-length corpus: five length classes landing in distinct frame
    buckets (~210/455/700/945/1190 frames at mean dur 7) incl. T≥1024."""
    from vispeech_tpu.config import DataConfig
    from vispeech_tpu.data.dataset import FilelistDataset, MAX_FRAMES
    from vispeech_tpu.data.synthetic import write_synthetic_dataset

    t0 = time.time()
    train_list, _, data_root = write_synthetic_dataset(
        root, sr=44100, hop=512, n_utts=n_utts,
        n_phones_choices=(30, 65, 100, 135, 170),
        dur_range=(4, 10), seed=0, val_utts=1,
    )
    cfg = DataConfig(
        training_files=train_list, sampling_rate=44100, filter_length=2048,
        hop_length=512, win_length=2048, spk2id=(("spk0", 0), ("spk1", 1)),
    )
    ds = FilelistDataset(train_list, cfg, data_root=data_root)
    # device-DSP pipeline: training needs only int16 wavs (validated here);
    # the eval path computes a host spec for the single val utterance
    for u in ds.utterances:
        ds.load_wav_int16(u)
    ds.load_audio(ds.utterances[0])
    frames = np.array([u.n_frames for u in ds.utterances])
    info = {
        "n_utts": len(ds),
        "frames_min": int(frames.min()),
        "frames_max": int(frames.max()),
        "frames_ge_1024": int((frames >= 1024).sum()),
        "audio_seconds_total": round(float(frames.sum()) * 512 / 44100, 1),
        "prep_seconds": round(time.time() - t0, 1),
        "max_frames_filter": MAX_FRAMES,
    }
    print(f"[corpus] {info}", flush=True)
    return info


def launch(cfg_path: str, data_root: str, max_steps: int, log_path: str):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = open(log_path, "ab")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "train.py"), "-c", cfg_path,
         "--data-root", data_root, "--max-steps", str(max_steps)],
        stdout=out, stderr=subprocess.STDOUT, cwd=repo, env=env,
    )
    return proc


def parse_log(save_dir: str):
    """(step, mel, g, d, steps_per_sec) rows from train.log."""
    rows = []
    path = os.path.join(save_dir, "train.log")
    if not os.path.exists(path):
        return rows
    for line in open(path, errors="replace"):
        m = LOG_RE.search(line)
        if m:
            rows.append({
                "step": int(m.group(2)), "g": float(m.group(3)),
                "d": float(m.group(4)), "mel": float(m.group(5)),
                "steps_per_sec": float(m.group(6)),
            })
    return rows


def current_step(save_dir: str) -> int:
    rows = parse_log(save_dir)
    return rows[-1]["step"] if rows else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--kill-frac", type=float, default=0.55,
                   help="SIGTERM run 1 at this fraction of --steps")
    p.add_argument("--utts", type=int, default=70)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--workspace", default="/tmp/vispeech_trainer_e2e")
    p.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    p.add_argument("--keep-workspace", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="train under the bf16 tail_f32 policy (+bf16 D) — "
                        "production-shape validation of the round-4 "
                        "reduced-precision policy")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    root = args.workspace
    save_dir = os.path.join(root, "run")
    if os.path.exists(save_dir) and not args.keep_workspace:
        import shutil

        shutil.rmtree(save_dir)

    corpus = prep_corpus(root, args.utts)
    cfg_path = write_config(root, save_dir, args.batch,
                            bf16=args.bf16, bf16_disc=args.bf16)
    data_root = os.path.join(root, "dataset")
    harness_log = os.path.join(root, "trainer_stdout.log")

    kill_at = int(args.steps * args.kill_frac)
    t_run1 = time.time()
    # stall watchdog: the axon tunnel can wedge a client mid-handshake
    # (observed: jit-init hang with every thread idle); if the step count
    # stops moving for --stall-timeout, hard-kill and relaunch once —
    # resume-from-latest makes the retry safe.
    stall_timeout = 900
    retries = 1
    killed_at = None
    proc = launch(cfg_path, data_root, args.steps, harness_log)
    print(f"[run1] pid {proc.pid}: training to {args.steps}, SIGTERM at "
          f"~step {kill_at}", flush=True)
    def _progress_token():
        # any train.log growth counts as progress (bucket compiles log
        # before the first steps/s line appears at log_interval)
        try:
            sz = os.path.getsize(os.path.join(save_dir, "train.log"))
        except OSError:
            sz = 0
        return (current_step(save_dir), sz)

    last_progress = (time.time(), (-1, -1))
    while proc.poll() is None:
        time.sleep(5)
        tok = _progress_token()
        s = tok[0]
        if tok > last_progress[1]:
            last_progress = (time.time(), tok)
        elif time.time() - last_progress[0] > stall_timeout:
            print(f"[run1] STALL: no step progress in {stall_timeout}s at "
                  f"step {s}; killing pid {proc.pid}", flush=True)
            proc.kill()
            proc.wait(timeout=60)
            if retries <= 0:
                raise RuntimeError("trainer stalled twice; giving up")
            retries -= 1
            time.sleep(90)  # let the tunnel's dead connection drain
            proc = launch(cfg_path, data_root, args.steps, harness_log)
            print(f"[run1] relaunched pid {proc.pid}", flush=True)
            last_progress = (time.time(), _progress_token())
        if s >= kill_at:
            killed_at = s
            print(f"[run1] step {s} >= {kill_at}: sending SIGTERM "
                  f"(preemption drill)", flush=True)
            proc.send_signal(signal.SIGTERM)
            break
    rc1 = proc.wait(timeout=600)
    run1_s = round(time.time() - t_run1, 1)
    rows1 = parse_log(save_dir)
    stats1 = json.load(open(os.path.join(save_dir, "train_stats.json")))
    print(f"[run1] exit rc={rc1} after {run1_s}s at step "
          f"{stats1['global_step']} ({len(stats1['compiled_shapes'])} "
          f"compiles)", flush=True)
    if killed_at is None:
        print("[run1] WARNING: finished before the kill step — preemption "
              "drill degraded to a plain run", flush=True)

    ckpt_step = stats1["global_step"]
    pre_kill_mel = [r["mel"] for r in rows1 if r["step"] <= ckpt_step][-4:]

    # ---- run 2: resume from the preemption checkpoint -------------------
    t_run2 = time.time()
    proc = launch(cfg_path, data_root, args.steps, harness_log)
    print(f"[run2] pid {proc.pid}: resuming to {args.steps}", flush=True)
    rc2 = proc.wait(timeout=7200)
    run2_s = round(time.time() - t_run2, 1)
    rows2 = parse_log(save_dir)
    stats2 = json.load(open(os.path.join(save_dir, "train_stats.json")))
    print(f"[run2] exit rc={rc2} after {run2_s}s at step "
          f"{stats2['global_step']}", flush=True)

    post = [r for r in rows2 if r["step"] > ckpt_step]
    final_mel = [r["mel"] for r in post][-4:]
    resumed_from = post[0]["step"] - 25 if post else None  # log_interval

    # steady-state throughput: median of logged steps/s after both runs'
    # compile phases (drop each run's first 4 log rows)
    sps1 = [r["steps_per_sec"] for r in rows1[4:]]
    sps2 = [r["steps_per_sec"] for r in post[4:]]
    all_mel = [(r["step"], r["mel"]) for r in rows2]

    result = {
        "metric": "trainer_e2e_flagship_tpu",
        "corpus": corpus,
        "batch_size": args.batch,
        "target_steps": args.steps,
        "run1": {
            "rc": rc1, "wall_s": run1_s, "ckpt_step": ckpt_step,
            "sigterm_at_step": killed_at,
            "n_compiles": stats1["n_compiles"],
            "compiled_shapes": stats1["compiled_shapes"],
        },
        "run2": {
            "rc": rc2, "wall_s": run2_s,
            "final_step": stats2["global_step"],
            "resumed_descent": bool(final_mel and pre_kill_mel and
                                    np.mean(final_mel) < np.mean(pre_kill_mel)),
        },
        "mel_initial": rows2[0]["mel"] if rows2 else None,
        "mel_at_preemption": round(float(np.mean(pre_kill_mel)), 3)
        if pre_kill_mel else None,
        "mel_final": round(float(np.mean(final_mel)), 3) if final_mel else None,
        "steps_per_sec_run1_median": round(float(np.median(sps1)), 2)
        if sps1 else None,
        "steps_per_sec_run2_median": round(float(np.median(sps2)), 2)
        if sps2 else None,
        # host dispatch backpressure only — NOT device step times
        "dispatch_ms_by_bucket": stats2.get(
            "dispatch_ms_by_bucket", stats2.get("steps_by_bucket")),
        # round-5 instrumentation: collate stall + blocking H2D copy per
        # step, both overlapped with compute by the Trainer's double buffer
        "input_pipeline_ms": stats2.get("input_pipeline_ms"),
        "loss_curve": all_mel,
    }

    # ---- loss-curve plot -------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [s for s, _ in all_mel]
    mels = [m for _, m in all_mel]
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(steps, mels, marker=".", lw=1)
    if killed_at is not None:
        ax.axvline(ckpt_step, color="r", ls="--",
                   label=f"SIGTERM + resume @ {ckpt_step}")
        ax.legend()
    ax.set_xlabel("step"), ax.set_ylabel("mel L1 ×45")
    ax.set_yscale("log")
    ax.set_title(
        f"Trainer e2e on TPU, flagship, B={args.batch}, mixed buckets "
        f"({corpus['frames_min']}–{corpus['frames_max']} frames): "
        f"mel {mels[0]:.1f} → {mels[-1]:.1f}")
    fig.tight_layout()
    fig.savefig(os.path.join(
        args.out_dir,
        "trainer_e2e_bf16_loss.png" if args.bf16 else "trainer_e2e_loss.png",
    ), dpi=100)

    out_path = os.path.join(
        args.out_dir, "trainer_e2e_bf16.json" if args.bf16 else "trainer_e2e.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"},
                     indent=1), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
