#!/usr/bin/env python
"""F0 + energy extraction → final training filelist (reference f0energy.py).

Per utterance in ``filelists/{lang}.dur``:
  * F0 via the in-repo Boersma AC tracker (native C++ when built — the
    replacement for parselmouth, SURVEY.md §2.8 ledger), interpolated across
    unvoiced gaps, averaged per phoneme;
  * energy as per-frame spectral L2 (n_fft 1280, the reference's quirk),
    averaged per phoneme;
  * wav moved from ``mfa_temp/wavs/...`` into ``dataset/{spk}/``;
  * final line ``spk|id|phones|durs|f0|energy`` → ``filelists/{lang}_train.list``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lang", default="zh")
    p.add_argument("--dur-file", default=None)
    p.add_argument("--wav-root", default="mfa_temp/wavs")
    p.add_argument("--dataset-root", default="dataset")
    p.add_argument("--out", default=None)
    p.add_argument("--sampling-rate", type=int, default=44100)
    p.add_argument("--hop-length", type=int, default=512)
    p.add_argument("--move-wavs", action="store_true",
                   help="move (not copy) wavs into the dataset dir")
    p.add_argument("--backend", default="auto", choices=["auto", "native", "numpy"])
    args = p.parse_args()

    from vispeech_tpu.dsp.pitch import (
        extract_f0,
        frame_energy,
        interpolate_f0,
        phoneme_average,
    )

    dur_file = args.dur_file or f"filelists/{args.lang}.dur"
    out_path = args.out or f"filelists/{args.lang}_train.list"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n_ok = n_skip = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for line in open(dur_file, encoding="utf-8"):
            spk, utt_id, phones, durations = line.strip().split("|")
            durs = np.array([int(d) for d in durations.split(" ")], np.int64)
            n_frames = int(durs.sum())
            wav_path = os.path.join(args.wav_root, args.lang, spk, f"{utt_id}.wav")
            target_dir = os.path.join(args.dataset_root, spk)
            os.makedirs(target_dir, exist_ok=True)
            target_path = os.path.join(target_dir, f"{utt_id}.wav")
            try:
                sr, data = wavfile.read(wav_path)
                if sr != args.sampling_rate:
                    raise ValueError(f"{sr} != {args.sampling_rate}")
                wav = data.astype(np.float64) / 32768.0
                f0 = extract_f0(
                    wav, sr, args.hop_length, n_frames, backend=args.backend
                )
                f0 = interpolate_f0(f0)
                ph_f0 = phoneme_average(f0, durs)
                energy = frame_energy(
                    wav, n_frames, n_fft=1280, hop_length=args.hop_length
                )
                ph_energy = phoneme_average(energy, durs)
            except Exception as e:  # noqa: BLE001
                print(f"skip {wav_path}: {e}")
                n_skip += 1
                continue
            if args.move_wavs:
                shutil.move(wav_path, target_path)
            else:
                shutil.copy2(wav_path, target_path)
            f0_s = " ".join(f"{v:.3f}" for v in ph_f0)
            en_s = " ".join(f"{v:.3f}" for v in ph_energy)
            out.write(f"{spk}|{utt_id}|{phones}|{durations}|{f0_s}|{en_s}\n")
            n_ok += 1
    print(f"wrote {out_path}: {n_ok} utterances ({n_skip} skipped)")


if __name__ == "__main__":
    main()
