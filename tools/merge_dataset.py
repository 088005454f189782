#!/usr/bin/env python
"""Merge per-language filelists into train/val splits (reference
merge_dataset.py): last `--val-per-spk` utterances of each speaker go to val.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--langs", nargs="+", default=["zh", "ja"])
    p.add_argument("--filelist-dir", default="filelists")
    p.add_argument("--val-per-spk", type=int, default=2)
    args = p.parse_args()

    spk2utts = defaultdict(list)
    for lang in args.langs:
        path = os.path.join(args.filelist_dir, f"{lang}_train.list")
        if not os.path.exists(path):
            continue
        for line in open(path, encoding="utf-8"):
            if line.strip():
                spk2utts[line.split("|")[0]].append(line)

    train_lines, val_lines = [], []
    for spk, lines in spk2utts.items():
        val_lines += lines[-args.val_per_spk:]
        train_lines += lines[: -args.val_per_spk]

    for name, lines in (("train.list", train_lines), ("val.list", val_lines)):
        with open(os.path.join(args.filelist_dir, name), "w", encoding="utf-8") as f:
            f.writelines(lines)
    print(f"train: {len(train_lines)}, val: {len(val_lines)}, "
          f"speakers: {len(spk2utts)}")


if __name__ == "__main__":
    main()
