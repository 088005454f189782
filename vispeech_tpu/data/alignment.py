"""MFA alignment post-processing (reference post_mfa.py:15-149).

TextGrid phone tiers → per-phoneme frame durations, with the reference's
refinement rules:

- interval gaps become ``sp`` tokens; durations are frame-rounded boundary
  differences so Σdur == round(total_time·sr/hop) exactly (post_mfa.py:50-89);
- consecutive duplicate phones merge, summing durations (post_mfa.py:128-139);
- silences are probabilistically relabeled as punctuation by length — a
  triangular probability over frame count for ``,`` (3..40 frames, mode 15)
  and ``…`` (30+ frames), first silence always ``sp``, last one ``sp`` 80% /
  ``.`` 20% (post_mfa.py:15-48);
- optional label-guided refinement replaces silences with the ground-truth
  punctuation from the transcript (post_mfa.py:91-126).

RNG is injected (``np.random.Generator``) so pipelines are reproducible.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from vispeech_tpu.data.textgrid import IntervalTier

SILENCE_SYMBOLS = ("sil", "sp", "spn")
PUNCTUATION = (",", ".", "!", "?", "…", "~")


def _frames(t: float, sr: int, hop: int) -> int:
    return int(np.round(t * sr / hop))


def tier_to_alignment(
    tier: IntervalTier, sr: int = 44100, hop: int = 512
) -> Tuple[List[str], List[int]]:
    """Phone tier → (phones, frame durations); gaps become ``sp``
    (reference get_alignment, post_mfa.py:50-89)."""
    phones: List[str] = []
    durations: List[int] = []
    last_end = 0.0
    for iv in tier.intervals:
        if iv.start_time != last_end:
            phones.append("sp")
            durations.append(
                _frames(iv.start_time, sr, hop) - _frames(last_end, sr, hop)
            )
        phones.append(iv.text if iv.text else "sp")
        durations.append(
            _frames(iv.end_time, sr, hop) - _frames(iv.start_time, sr, hop)
        )
        last_end = iv.end_time
    if tier.end_time != last_end:
        phones.append("sp")
        durations.append(
            _frames(tier.end_time, sr, hop) - _frames(last_end, sr, hop)
        )
    return phones, durations


def merge_duplicates(
    phones: Sequence[str], durations: Sequence[int]
) -> Tuple[List[str], List[int]]:
    """Merge consecutive identical phones, summing durations
    (reference remove_dup, post_mfa.py:128-139)."""
    out_p: List[str] = []
    out_d: List[int] = []
    last = None
    for p, d in zip(phones, durations):
        if p != last:
            out_p.append(p)
            out_d.append(d)
        else:
            out_d[-1] += d
        last = p
    return out_p, out_d


def silence_to_punctuation(
    frames: int, is_last: bool, is_first: bool, rng: np.random.Generator
) -> str:
    """Relabel one silence by duration (reference get_sp, post_mfa.py:32-48).

    The reference passes [minimum, maximum, mean] positionally into
    get_probability(x, minimum, maximum, mean) from the dict values
    [3,15,40] for ``,`` and [30,1000,1000] for ``…`` — kept verbatim.
    """
    if is_first:
        return "sp"
    if is_last:
        return "sp" if rng.random() < 0.8 else "."
    probs = np.array([
        _tri_ref(frames, 3, 15, 40),
        _tri_ref(frames, 30, 1000, 1000),
        0.01,
    ])
    probs = np.maximum(probs, 0)
    if probs.sum() <= 0:
        return "sp"
    return [",", "…", "sp"][rng.choice(3, p=probs / probs.sum())]


def _tri_ref(x: float, minimum: float, maximum: float, mean: float) -> float:
    """Reference probability shape verbatim semantics (post_mfa.py:20-28):
    zero outside (minimum, maximum), peak 1 at ``mean`` — note ``,`` uses
    (3, 15, 40) so its support is (3, 15) with the peak clamped by max."""
    if x <= minimum or x >= maximum:
        return 0.0
    if x == mean:
        return 1.0
    if x < mean:
        return (x - minimum) / (mean - minimum)
    return (maximum - x) / (maximum - mean)


def refine_alignment(
    phones: Sequence[str],
    durations: Sequence[int],
    rng: Optional[np.random.Generator] = None,
) -> Tuple[List[str], List[int]]:
    """Dedup + silence→punctuation relabeling (reference refine,
    post_mfa.py:141-149)."""
    rng = rng or np.random.default_rng()
    phones = ["sp" if p in SILENCE_SYMBOLS else p for p in phones]
    phones, durations = merge_duplicates(phones, durations)
    out = list(phones)
    for i, (p, d) in enumerate(zip(phones, durations)):
        if p in SILENCE_SYMBOLS:
            is_last = i == len(phones) - 1 and (
                i == 0 or phones[i - 1] not in SILENCE_SYMBOLS
            )
            out[i] = silence_to_punctuation(d, is_last, i == 0, rng)
    return out, list(durations)


def refine_from_labels(
    phones: Sequence[str], durations: Sequence[int], label: str
) -> List[str]:
    """Label-guided refinement: align MFA phones with the ground-truth phone
    string, replacing silences with its punctuation (reference
    refine_from_labels, post_mfa.py:91-126)."""
    gt = label.strip().split(" ")
    i = j = 0
    refined: List[str] = []
    gtph: Optional[str] = None
    while i < len(phones) and j < len(gt):
        ph = phones[i]
        gtph = gt[j]
        if ph == gtph or gtph.lower() == ph.lower():
            i += 1
            j += 1
            refined.append(gtph)
        elif ph in SILENCE_SYMBOLS:
            i += 1
            refined.append(ph)
        elif gtph in PUNCTUATION:
            if i > 0 and refined and refined[-1] in SILENCE_SYMBOLS:
                refined[-1] = gtph
            j += 1
        else:
            raise ValueError(f"cannot align {ph!r} with {gtph!r}")
    if i != len(phones):
        refined += list(phones[i:])
    if gtph in PUNCTUATION and refined and refined[-1] in SILENCE_SYMBOLS:
        refined[-1] = gtph
    if len(refined) != len(phones):
        raise ValueError("refinement length mismatch")
    return refined
