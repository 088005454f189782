"""Mandarin hanzi → phoneme G2P (requires pypinyin + jieba).

Pipeline per normalized sentence (reference text/frontend/zh_frontend.py:123-175,
257-287): strip latin, jieba POS segmentation → sandhi pre-merge → per-word
pypinyin (initials / FINALS_TONE3 with neutral-tone-as-5) → ii/iii apical-vowel
discrimination → tone sandhi → optional erhua merge → phone assembly.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from vispeech_tpu.text.sandhi import ToneSandhi

_PUNC = ["!", "?", "…", ",", ".", "#", "-"]

MUST_ERHUA = {"小院儿", "胡同儿", "范儿", "老汉儿", "撒欢儿", "寻老礼儿", "妥妥儿"}
NOT_ERHUA = {
    "虐儿", "为儿", "护儿", "瞒儿", "救儿", "替儿", "有儿", "一儿", "我儿", "俺儿", "妻儿",
    "拐儿", "聋儿", "乞儿", "患儿", "幼儿", "孤儿", "婴儿", "婴幼儿", "连体儿", "脑瘫儿",
    "流浪儿", "体弱儿", "混血儿", "蜜雪儿", "舫儿", "祖儿", "美儿", "应采儿", "可儿", "侄儿",
    "孙儿", "侄孙儿", "女儿", "男儿", "红孩儿", "花儿", "虫儿", "马儿", "鸟儿", "猪儿", "猫儿",
    "狗儿",
}

_sandhi = ToneSandhi()
_initialized = False


def _init_pypinyin() -> None:
    """One-time pypinyin dictionary tweaks (reference zh_frontend.py:71-86)."""
    global _initialized
    if _initialized:
        return
    from pypinyin import load_single_dict

    try:
        from pypinyin_dict.phrase_pinyin_data import large_pinyin

        large_pinyin.load()
    except ImportError:
        pass
    # prefer the neutral reading of 地 (de) over dì
    load_single_dict({ord("地"): "de,di4"})
    _initialized = True


def word_to_initials_finals(word: str) -> Tuple[List[str], List[str]]:
    """pypinyin G2P for one word with apical-vowel discrimination
    (reference zh_frontend.py:88-103)."""
    from pypinyin import Style, lazy_pinyin

    initials = lazy_pinyin(word, neutral_tone_with_five=True, style=Style.INITIALS)
    finals = lazy_pinyin(word, neutral_tone_with_five=True, style=Style.FINALS_TONE3)
    out_i, out_f = [], []
    for c, v in zip(initials, finals):
        if re.match(r"i\d", v):
            if c in ("z", "c", "s"):
                v = "i" + v  # i → ii
            elif c in ("zh", "ch", "sh", "r"):
                v = "ii" + v  # i → iii
        out_i.append(c)
        out_f.append(v)
    return out_i, out_f


def _merge_erhua(
    initials: List[str], finals: List[str], word: str, pos: str
) -> Tuple[List[str], List[str]]:
    """Fold a trailing 儿 into the previous final's r-colored form
    (reference zh_frontend.py:177-201)."""
    if word not in MUST_ERHUA and (word in NOT_ERHUA or pos in ("a", "j", "nr")):
        return initials, finals
    if len(finals) != len(word):
        return initials, finals
    new_i: List[str] = []
    new_f: List[str] = []
    for i, phn in enumerate(finals):
        if (
            i == len(finals) - 1
            and word[i] == "儿"
            and phn in ("er2", "er5")
            and word[-2:] not in NOT_ERHUA
            and new_f
        ):
            new_f[-1] = new_f[-1][:-1] + "r" + new_f[-1][-1]
        else:
            new_f.append(phn)
            new_i.append(initials[i])
    return new_i, new_f


def sentence_to_phonemes(sentence: str, with_erhua: bool = False) -> List[str]:
    """One normalized sentence → phones."""
    import jieba.posseg as psg

    _init_pypinyin()
    sentence = re.sub("[a-zA-Z]+", "", sentence)
    seg = [(w, p) for w, p in psg.lcut(sentence)]
    seg = _sandhi.pre_merge_for_modify(seg)
    phones: List[str] = []
    for word, pos in seg:
        if pos == "eng":
            continue
        initials, finals = word_to_initials_finals(word)
        finals = _sandhi.modified_tone(word, pos, finals)
        if with_erhua:
            initials, finals = _merge_erhua(initials, finals, word, pos)
        for c, v in zip(initials, finals):
            if c:
                phones.append(c)
            if v and v not in _PUNC:
                phones.append(v)
    return phones


def hanzi_to_phonemes(text: str, with_erhua: bool = False) -> List[str]:
    """Normalized text (single sentence or fragment) → phones.

    The ``嗯→恩`` substitution and trailing-``sp`` trim mirror
    reference zh_frontend.py:263 and 167-174.
    """
    text = text.replace("嗯", "恩")
    phones = sentence_to_phonemes(text, with_erhua=with_erhua)
    if phones and phones[-1] == "sp":
        phones = phones[:-1]
    return phones
