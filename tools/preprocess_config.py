#!/usr/bin/env python
"""Assign speaker ids from the train filelist and rewrite ``spk2id`` into the
config JSON (reference preprocess_config.py)."""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default="configs/config.json")
    p.add_argument("--filelist", default="filelists/train.list")
    args = p.parse_args()

    config = json.load(open(args.config, encoding="utf-8"))
    spk2id = {}
    for line in open(args.filelist, encoding="utf-8"):
        spk = line.split("|")[0]
        if spk and spk not in spk2id:
            spk2id[spk] = len(spk2id)
    config.setdefault("data", {})["spk2id"] = spk2id
    with open(args.config, "w", encoding="utf-8") as f:
        json.dump(config, f, ensure_ascii=False, indent=2)
    print(f"{len(spk2id)} speakers -> {args.config}")


if __name__ == "__main__":
    main()
