"""Praat TextGrid reader (replaces the reference's ``tgt`` dependency,
post_mfa.py:6,159 — only the subset MFA output needs: IntervalTiers).

Supports both the long ("ooTextFile") and short text formats that MFA and
Praat emit, in UTF-8 or UTF-16.
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Interval:
    start_time: float
    end_time: float
    text: str


@dataclass
class IntervalTier:
    name: str
    start_time: float
    end_time: float
    intervals: List[Interval] = field(default_factory=list)


@dataclass
class TextGrid:
    start_time: float
    end_time: float
    tiers: List[IntervalTier] = field(default_factory=list)

    def get_tier_by_name(self, name: str) -> IntervalTier:
        for t in self.tiers:
            if t.name == name:
                return t
        raise KeyError(f"no tier named {name!r}; have {[t.name for t in self.tiers]}")


def _read_text(path: str) -> str:
    with open(path, "rb") as f:
        raw = f.read()
    if raw.startswith(codecs.BOM_UTF16_LE) or raw.startswith(codecs.BOM_UTF16_BE):
        return raw.decode("utf-16")
    return raw.decode("utf-8-sig")


_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


def read_textgrid(path: str) -> TextGrid:
    text = _read_text(path)
    if re.search(r"item\s*\[", text):
        return _parse_long(text)
    return _parse_short(text)


def _parse_long(text: str) -> TextGrid:
    def grab(pattern: str, s: str) -> List[str]:
        return re.findall(pattern, s)

    xmin = float(grab(rf"xmin\s*=\s*({_NUM})", text)[0])
    xmax = float(grab(rf"xmax\s*=\s*({_NUM})", text)[0])
    grid = TextGrid(xmin, xmax)

    # split into item blocks (tier chunks)
    items = re.split(r"item\s*\[\d+\]\s*:", text)[1:]
    for item in items:
        cls = grab(r'class\s*=\s*"([^"]*)"', item)
        if not cls or cls[0] != "IntervalTier":
            continue
        name = grab(r'name\s*=\s*"([^"]*)"', item)[0]
        t_xmin = float(grab(rf"xmin\s*=\s*({_NUM})", item)[0])
        t_xmax = float(grab(rf"xmax\s*=\s*({_NUM})", item)[0])
        tier = IntervalTier(name, t_xmin, t_xmax)
        for m in re.finditer(
            rf'intervals\s*\[\d+\]\s*:\s*'
            rf"xmin\s*=\s*({_NUM})\s*"
            rf"xmax\s*=\s*({_NUM})\s*"
            rf'text\s*=\s*"((?:[^"]|"")*)"',
            item,
        ):
            tier.intervals.append(
                Interval(float(m.group(1)), float(m.group(2)),
                         m.group(3).replace('""', '"').strip())
            )
        grid.tiers.append(tier)
    return grid


def _parse_short(text: str) -> TextGrid:
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    # header: "ooTextFile", "TextGrid", xmin, xmax, <exists>, n_tiers
    if not lines or "ooTextFile" not in lines[0]:
        raise ValueError("not a TextGrid file")
    i = 2
    xmin = float(lines[i]); xmax = float(lines[i + 1])
    n_tiers = int(lines[i + 3])
    grid = TextGrid(xmin, xmax)
    i += 4
    for _ in range(n_tiers):
        cls = lines[i].strip('"'); i += 1
        name = lines[i].strip('"'); i += 1
        t_xmin = float(lines[i]); t_xmax = float(lines[i + 1]); i += 2
        n_int = int(lines[i]); i += 1
        tier = IntervalTier(name, t_xmin, t_xmax)
        if cls == "IntervalTier":
            for _ in range(n_int):
                a = float(lines[i]); b = float(lines[i + 1])
                txt = lines[i + 2].strip('"'); i += 3
                tier.intervals.append(Interval(a, b, txt.strip()))
            grid.tiers.append(tier)
        else:  # PointTier: skip (time, mark) pairs
            i += 2 * n_int
    return grid
