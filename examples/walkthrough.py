#!/usr/bin/env python
"""End-to-end walkthrough: train → synthesize → prosody-edit → voice-convert.

The script equivalent of the reference's ``inference.ipynb`` (TTS + speaker
selection + voice conversion cells), extended with the per-phoneme
prosody-edit loop the reference only exposes through its Qt GUI
(reference gui.py:82-113): synthesize, read back the predicted per-phoneme
F0, shift it, and re-drive synthesis with the edited tensor.

Self-contained: generates a tiny synthetic 2-speaker corpus, trains the real
Trainer for a few steps (enough to exercise the full system, not to sound
good), then walks every inference surface and writes audio artifacts.

    python examples/walkthrough.py [--out-dir out] [--steps 8]
    python examples/walkthrough.py --ckpt-dir logdir/run   # skip training

With a real trained checkpoint (--ckpt-dir + --config), the same walkthrough
produces listenable audio; see benchmarks/bench_trained_serving.py for the
trained-checkpoint closure evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_workspace(root: str):
    """Tiny 2-speaker synthetic corpus + config (8 kHz, 16-ch model)."""
    from vispeech_tpu.config import load_config
    from scipy.io import wavfile

    hop = 64
    os.makedirs(root, exist_ok=True)
    cfg_dict = {
        "train": {
            "log_interval": 2, "eval_interval": 1000, "seed": 0,
            "epochs": 10_000, "batch_size": 2, "fp16_run": False,
            "segment_size": 4 * hop, "save_dir": os.path.join(root, "run"),
        },
        "data": {
            "training_files": os.path.join(root, "train.list"),
            "validation_files": os.path.join(root, "val.list"),
            "sampling_rate": 8000, "filter_length": 256, "hop_length": hop,
            "win_length": 256, "n_mel_channels": 20, "n_speakers": 2,
            "spk2id": {"alice": 0, "bob": 1},
        },
        "model": {
            "inter_channels": 16, "hidden_channels": 16,
            "filter_channels": 32, "n_heads": 2, "n_layers": 1,
            "upsample_rates": [4, 4, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [8, 8, 4, 4],
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "gin_channels": 8,
        },
    }
    cfg_path = os.path.join(root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg_dict, f, indent=1)

    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        spk = ["alice", "bob"][i % 2]
        n_ph = 4 + i
        durs = rng.randint(2, 6, size=n_ph)
        wav = (rng.randn(int(durs.sum()) * hop) * 0.1 * 32767).astype(np.int16)
        os.makedirs(os.path.join(root, "dataset", spk), exist_ok=True)
        wavfile.write(
            os.path.join(root, "dataset", spk, f"u{i}.wav"), 8000, wav)
        phones = " ".join(["n", "i2", "h", "ao3"] + ["sp"] * (n_ph - 4))
        f0 = " ".join(f"{v:.1f}" for v in rng.uniform(100, 300, n_ph))
        en = " ".join(f"{v:.1f}" for v in rng.uniform(30, 90, n_ph))
        lines.append(f"{spk}|u{i}|{phones}|{' '.join(map(str, durs))}|{f0}|{en}")
    with open(os.path.join(root, "train.list"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "val.list"), "w") as f:
        f.write(lines[0] + "\n")
    return cfg_path, load_config(cfg_path)


def write_wav(path: str, audio: np.ndarray, sr: int):
    from vispeech_tpu.infer.server import wav_bytes

    with open(path, "wb") as f:
        f.write(wav_bytes(audio, sr))
    print(f"  wrote {path} ({len(audio) / sr:.2f}s @ {sr} Hz)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="walkthrough_out")
    ap.add_argument("--workspace", default=None,
                    help="corpus/run dir (default: <out-dir>/ws)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--config", default=None,
                    help="use an existing config (with --ckpt-dir)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="skip training, serve this checkpoint")
    ap.add_argument("--text", default="[P]ni2 hao3 shi4 jie4[P]")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- 1. corpus + training (reference train.py, but one command) -----
    if args.ckpt_dir is None:
        root = args.workspace or os.path.join(args.out_dir, "ws")
        cfg_path, cfg = build_workspace(root)
        print(f"[1/5] training {args.steps} steps on the synthetic corpus")
        from vispeech_tpu.train.loop import Trainer

        trainer = Trainer(cfg, data_root=os.path.join(root, "dataset"))
        trainer.resume()
        trainer.train(max_steps=args.steps)
        ckpt_dir = cfg.train.save_dir
        cfg_path = os.path.join(ckpt_dir, "config.json")
    else:
        ckpt_dir = args.ckpt_dir
        cfg_path = args.config or os.path.join(ckpt_dir, "config.json")
        print(f"[1/5] using existing checkpoint in {ckpt_dir}")

    # ---- 2. load the engine once, synthesize (inference.ipynb cell 1) ---
    from vispeech_tpu.infer.pipeline import TTSEngine

    engine = TTSEngine.from_checkpoint(cfg_path, ckpt_dir)
    sr = engine.cfg.data.sampling_rate
    print(f"[2/5] synthesize: {args.text!r} as speaker 'alice'")
    res = engine.synthesize(text=args.text, speaker="alice")
    write_wav(os.path.join(args.out_dir, "tts_alice.wav"), res["audio"], sr)
    print(f"  phones: {' '.join(res['phones'])}")
    print(f"  predicted F0 (Hz): {np.round(res['f0'], 1).tolist()}")

    # ---- 3. speaker selection (ipynb cell 2) ----------------------------
    print("[3/5] same text as speaker 'bob'")
    res_b = engine.synthesize(text=args.text, speaker="bob")
    write_wav(os.path.join(args.out_dir, "tts_bob.wav"), res_b["audio"], sr)

    # ---- 4. per-phoneme prosody edit (the GUI slider loop) --------------
    print("[4/5] pitch-edit: shift predicted F0 +4 semitones, re-drive")
    edited_f0 = res["f0"] * (2.0 ** (4.0 / 12.0))
    res_e = engine.synthesize(
        phones=res["phones"], speaker="alice",
        pitch_control=edited_f0,
        duration_control=res["duration"],  # keep timing fixed while editing
    )
    write_wav(os.path.join(args.out_dir, "tts_alice_pitch+4st.wav"),
              res_e["audio"], sr)

    # ---- 5. voice conversion (ipynb cell 3; models.py:724-732) ----------
    print("[5/5] voice conversion: alice recording -> bob voice")
    vc = engine.voice_conversion(res["audio"], "alice", "bob")
    write_wav(os.path.join(args.out_dir, "vc_alice_to_bob.wav"),
              vc["audio"], sr)

    summary = {
        "text": args.text,
        "phones": res["phones"],
        "f0_pred_hz": np.round(res["f0"], 2).tolist(),
        "f0_edited_hz": np.round(edited_f0, 2).tolist(),
        "artifacts": sorted(
            f for f in os.listdir(args.out_dir) if f.endswith(".wav")),
        "sampling_rate": sr,
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"walkthrough": "ok", **{k: summary[k] for k in
                                              ("artifacts",)}}))


if __name__ == "__main__":
    main()
