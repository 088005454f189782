#!/usr/bin/env python
"""Round-4 directive #5: close the loop — a TRAINED checkpoint through the
serving surface, with committed audio artifacts.

Loads the Trainer-written checkpoint from the round-4 e2e run
(bench_trainer_e2e.py workspace), builds a TTSEngine via the public
`from_checkpoint` path (infer/pipeline.py — the format-compat claim that
had never been exercised against a real trained artifact), and synthesizes:

  1. training utterances teacher-forced (GT duration/F0/energy overrides —
     the overfit target; mel L1 vs ground truth is reported),
  2. the same utterance free-running (predicted prosody),
  3. a pitch-edited variant (+4 semitones on every phoneme) through the
     per-phoneme override tensor — the GUI slider contract
     (reference gui.py:82-113).

Artifacts → benchmarks/artifacts/trained_serving/: wavs, GT-vs-generated
mel PNG, F0-overlay PNG, summary JSON.

Usage: python benchmarks/bench_trained_serving.py \
           [--workspace /tmp/vispeech_trainer_e2e] [--utts 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workspace", default="/tmp/vispeech_trainer_e2e")
    p.add_argument("--utts", type=int, default=3)
    p.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        "trained_serving"))
    args = p.parse_args()

    from scipy.io import wavfile

    import jax
    from vispeech_tpu.config import load_config
    from vispeech_tpu.data.dataset import FilelistDataset
    from vispeech_tpu.dsp import mel_spectrogram
    from vispeech_tpu.infer.pipeline import TTSEngine
    from vispeech_tpu.text.symbols import symbols as SYMBOLS

    import jax.numpy as jnp

    run_dir = os.path.join(args.workspace, "run")
    cfg_path = os.path.join(run_dir, "config.json")
    engine = TTSEngine.from_checkpoint(cfg_path, run_dir)
    cfg = engine.cfg
    d = cfg.data
    print(f"engine loaded from {run_dir} (backend={jax.default_backend()})",
          flush=True)

    ds = FilelistDataset(d.training_files, d,
                         data_root=os.path.join(args.workspace, "dataset"))
    os.makedirs(args.out_dir, exist_ok=True)

    def mel_of(wav):
        return np.asarray(jax.device_get(mel_spectrogram(
            jnp.asarray(wav[None]), d.filter_length, d.n_mel_channels,
            d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin,
            d.mel_fmax)))[0]

    summary = {"checkpoint_dir": run_dir, "utts": []}
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for ui in range(min(args.utts, len(ds))):
        u = ds.utterances[ui]
        phones = [SYMBOLS[i] for i in u.phonemes]

        # 1) teacher-forced: GT duration/pitch/energy through the public
        #    per-phoneme override tensors
        tf = engine.synthesize(
            phones=phones, speaker=u.sid,
            duration_control=u.duration.astype(np.float32),
            pitch_control=u.f0, energy_control=u.energy,
            noise_scale=0.0, seed=0,
        )
        # 2) free-running (predicted prosody)
        fr = engine.synthesize(phones=phones, speaker=u.sid, seed=0)
        # 3) pitch-edited +4 semitones (the GUI slider contract: client
        #    takes the returned per-phoneme f0, edits, re-drives)
        f0_edit = np.asarray(fr["f0"], np.float32) * (2.0 ** (4 / 12.0))
        pe = engine.synthesize(
            phones=phones, speaker=u.sid, pitch_control=f0_edit,
            duration_control=np.asarray(fr["duration"], np.float32), seed=0,
        )

        _, wav_gt = ds.load_audio(u)
        mel_gt, mel_tf = mel_of(wav_gt), mel_of(tf["audio"])
        n = min(mel_gt.shape[0], mel_tf.shape[0])
        mel_l1 = float(np.mean(np.abs(mel_gt[:n] - mel_tf[:n])))

        for tag, out in (("teacher_forced", tf), ("free_run", fr),
                         ("pitch_edit+4st", pe)):
            wavfile.write(
                os.path.join(args.out_dir, f"u{ui:03d}_{tag}.wav"),
                d.sampling_rate,
                (np.clip(out["audio"], -1, 1) * 32767).astype(np.int16))

        fig, axes = plt.subplots(2, 1, figsize=(10, 6))
        for ax, mel, name in ((axes[0], mel_gt[:n], "ground truth"),
                              (axes[1], mel_tf[:n],
                               f"TTSEngine teacher-forced (L1 {mel_l1:.2f})")):
            ax.imshow(mel.T, aspect="auto", origin="lower",
                      interpolation="none")
            ax.set_title(name)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, f"u{ui:03d}_mel.png"), dpi=100)
        plt.close(fig)

        n_ph = len(phones)
        fig, ax = plt.subplots(figsize=(9, 3.5))
        ax.plot(u.f0[:n_ph], label="GT f0", marker="o", ms=3)
        ax.plot(np.asarray(fr["f0"])[:n_ph], label="predicted f0",
                marker="s", ms=3)
        ax.plot(f0_edit[:n_ph], label="edited (+4 st)", ls="--")
        ax.set_xlabel("phoneme"), ax.set_ylabel("Hz"), ax.legend()
        ax.set_title(f"u{ui:03d}: per-phoneme F0 (prosody-edit contract)")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, f"u{ui:03d}_f0.png"), dpi=100)
        plt.close(fig)

        row = {
            "utt": u.utt_id,
            "n_phones": n_ph,
            "mel_l1_teacher_forced": round(mel_l1, 4),
            "audio_s_teacher_forced": round(len(tf["audio"]) / d.sampling_rate, 2),
            "audio_s_free_run": round(len(fr["audio"]) / d.sampling_rate, 2),
            "pitch_edit_mean_f0_ratio": round(float(
                np.mean(f0_edit[:n_ph] / np.maximum(
                    np.asarray(fr["f0"])[:n_ph], 1e-3))), 3),
        }
        summary["utts"].append(row)
        print(row, flush=True)

    path = os.path.join(args.out_dir, "trained_serving.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
