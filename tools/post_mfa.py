#!/usr/bin/env python
"""MFA TextGrid → duration filelist (reference post_mfa.py:151-178).

Walks ``mfa_temp/textgrids/{lang}/{spk}/*.TextGrid``, converts interval times
to frame durations, applies the silence-refinement rules, and writes
``filelists/{lang}.dur`` lines ``spk|id|phones|durations``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lang", default="zh")
    p.add_argument("--textgrid-root", default="mfa_temp/textgrids")
    p.add_argument("--wav-root", default="mfa_temp/wavs",
                   help="for --label-refine transcript lookup")
    p.add_argument("--out", default=None, help="default filelists/{lang}.dur")
    p.add_argument("--sampling-rate", type=int, default=44100)
    p.add_argument("--hop-length", type=int, default=512)
    p.add_argument("--label-refine", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from vispeech_tpu.data.alignment import (
        SILENCE_SYMBOLS,
        refine_alignment,
        refine_from_labels,
        tier_to_alignment,
    )
    from vispeech_tpu.data.textgrid import read_textgrid

    out_path = args.out or f"filelists/{args.lang}.dur"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    rng = np.random.default_rng(args.seed)
    root = os.path.join(args.textgrid_root, args.lang)
    n_ok = n_err = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for spk in sorted(os.listdir(root)):
            spk_dir = os.path.join(root, spk)
            if not os.path.isdir(spk_dir):
                continue
            for name in sorted(os.listdir(spk_dir)):
                if not name.endswith("Grid"):
                    continue
                utt_id = name.replace(".TextGrid", "")
                try:
                    grid = read_textgrid(os.path.join(spk_dir, name))
                    phones, durs = tier_to_alignment(
                        grid.get_tier_by_name("phones"),
                        args.sampling_rate, args.hop_length,
                    )
                    phones = ["sp" if p in SILENCE_SYMBOLS else p for p in phones]
                    if args.label_refine:
                        label = open(
                            os.path.join(args.wav_root, args.lang, spk,
                                         f"{utt_id}.txt"),
                            encoding="utf-8",
                        ).read()
                        phones = refine_from_labels(phones, durs, label)
                    else:
                        phones, durs = refine_alignment(phones, durs, rng)
                except Exception as e:  # noqa: BLE001
                    print(f"error, please check: {spk_dir}/{name} ({e})")
                    n_err += 1
                    continue
                ph = " ".join(phones).replace("JA", ".")
                du = " ".join(str(d) for d in durs)
                out.write(f"{spk}|{utt_id}|{ph}|{du}\n")
                n_ok += 1
    print(f"wrote {out_path}: {n_ok} utterances ({n_err} errors)")


if __name__ == "__main__":
    main()
