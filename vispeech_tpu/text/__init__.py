"""Text frontend — text → phoneme symbols → integer id sequences.

Public surface mirrors the reference (text/__init__.py:9-17, text/cleaner.py:34-64):
  text_to_phones(text)          -> List[str]
  text_to_sequence(text)        -> List[int]
  cleaned_text_to_sequence(phs) -> List[int]
"""

from typing import List, Sequence

from vispeech_tpu.text.symbols import SYMBOL_TO_ID, ID_TO_SYMBOL, symbols, N_SYMBOLS  # noqa: F401


def cleaned_text_to_sequence(cleaned_text: Sequence[str]) -> List[int]:
    """Phoneme symbol list → id list (reference text/__init__.py:9-17)."""
    return [SYMBOL_TO_ID[symbol] for symbol in cleaned_text]


def sequence_to_symbols(sequence: Sequence[int]) -> List[str]:
    return [ID_TO_SYMBOL[i] for i in sequence]


def text_to_phones(text: str) -> List[str]:
    from vispeech_tpu.text.cleaner import text_to_phones as _ttp

    return _ttp(text)


def text_to_sequence(text: str) -> List[int]:
    return cleaned_text_to_sequence(text_to_phones(text))
