#!/usr/bin/env python
"""Emit MFA pronunciation dictionaries.

zh: Mandarin syllable→phones (reference text/frontend/generate_lexicon.py;
syllables-as-words convention).  ja: phones-as-words identity dictionary with
the ``.``→``JA`` suffix swap (reference mfa_temp/ja_dict.dict).

    python tools/generate_lexicon.py --with-tone -o mfa_temp/zh_dict.dict
    python tools/generate_lexicon.py --lang ja -o mfa_temp/ja_dict.dict
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lang", choices=("zh", "ja"), default="zh")
    p.add_argument("-o", "--output", default=None,
                   help="default: mfa_temp/{lang}_dict.dict")
    p.add_argument("--with-tone", action="store_true", default=True)
    p.add_argument("--no-tone", dest="with_tone", action="store_false")
    p.add_argument("--with-erhua", action="store_true")
    args = p.parse_args()
    if args.output is None:
        args.output = f"mfa_temp/{args.lang}_dict.dict"

    from vispeech_tpu.text.lexicon import generate_ja_lexicon, generate_lexicon

    if args.lang == "ja":
        lex = generate_ja_lexicon()
    else:
        lex = generate_lexicon(with_tone=args.with_tone, with_erhua=args.with_erhua)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as f:
        for syllable, phones in lex.items():
            f.write(f"{syllable}\t{phones}\n")
    print(f"wrote {args.output}: {len(lex)} syllables")


if __name__ == "__main__":
    main()
