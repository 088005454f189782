#!/usr/bin/env python
"""MFA corpus preparation (reference prepare_mfa.py:15-59).

Reads ``data/{lang}/{spk}/transcription_raw.txt`` (lines ``id|text``),
converts text → phonemes with the frontend (JA phones get their ``.`` suffix
swapped to the ``JA`` token so MFA's dictionary format survives), resamples
wavs to the target rate, and writes the MFA corpus layout
``mfa_temp/wavs/{lang}/{spk}/{id}.{wav,txt}``.  Prints the external ``mfa``
commands to run (alignment itself stays out of framework scope,
SURVEY.md §2.8).
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor, as_completed

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def text_to_mfa_phones(text: str):
    from vispeech_tpu.text import text_to_phones
    from vispeech_tpu.text.symbols import ja_symbols

    phones = text_to_phones(text)
    return [ph.replace(".", "JA") if ph in ja_symbols else ph for ph in phones]


def resample_to(wav: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return wav
    from math import gcd

    g = gcd(sr, target_sr)
    return resample_poly(wav, target_sr // g, sr // g)


def process_line(line: str):
    utt_id, text = line.strip().split("|", 1)
    return utt_id, " ".join(text_to_mfa_phones(text))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lang", default="zh")
    p.add_argument("--data-root", default="data")
    p.add_argument("--out-root", default="mfa_temp")
    p.add_argument("--sampling-rate", type=int, default=44100)
    p.add_argument("--workers", type=int, default=max(os.cpu_count() // 2, 1))
    args = p.parse_args()

    lang_dir = os.path.join(args.data_root, args.lang)
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        for spk in sorted(os.listdir(lang_dir)):
            tr = os.path.join(lang_dir, spk, "transcription_raw.txt")
            if not os.path.exists(tr):
                continue
            out_dir = os.path.join(args.out_root, "wavs", args.lang, spk)
            os.makedirs(out_dir, exist_ok=True)
            lines = open(tr, encoding="utf-8").readlines()
            futures = [ex.submit(process_line, ln) for ln in lines if ln.strip()]
            for fut in as_completed(futures):
                try:
                    utt_id, phones = fut.result()
                    src = os.path.join(lang_dir, spk, "wavs", f"{utt_id}.wav")
                    sr, wav = wavfile.read(src)
                    wav = wav.astype(np.float32) / 32768.0
                    wav = resample_to(wav, sr, args.sampling_rate)
                    wavfile.write(
                        os.path.join(out_dir, f"{utt_id}.wav"),
                        args.sampling_rate,
                        (np.clip(wav, -1, 1) * 32767).astype(np.int16),
                    )
                    with open(os.path.join(out_dir, f"{utt_id}.txt"), "w",
                              encoding="utf-8") as o:
                        o.write(phones + "\n")
                except Exception as e:  # noqa: BLE001
                    print(f"err: {spk} ({e})")

    print(f"rm -rf ./{args.out_root}/temp; "
          f"mfa align {args.out_root}/wavs/{args.lang} "
          f"{args.out_root}/{args.lang}_dict.dict "
          f"{args.out_root}/model.zip {args.out_root}/textgrids/{args.lang} "
          f"--clean --overwrite -t ./{args.out_root}/temp -j 5")


if __name__ == "__main__":
    main()
