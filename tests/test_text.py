"""Text frontend tests: vocabulary contract, pinyin G2P rules, cleaner dispatch,
NSW normalization golden strings (corpus inspired by reference text/cleaner.py:68-83)."""

import pytest

from vispeech_tpu.text import cleaned_text_to_sequence, symbols as sym_list
from vispeech_tpu.text.cleaner import text_to_phones, text_to_sequence
from vispeech_tpu.text.normalization import (
    TextNormalizer,
    num2str,
    verbalize_cardinal,
    verbalize_digits,
)
from vispeech_tpu.text.pinyin import pinyin_syllable_to_phones, pinyin_to_phonemes
from vispeech_tpu.text.symbols import (
    N_SYMBOLS,
    SYMBOL_TO_ID,
    en_symbols,
    ja_symbols,
    pu_symbols,
    symbols,
    zh_symbols,
)


class TestSymbols:
    def test_inventory_sizes(self):
        # contract: 519 symbols = pad + 401 zh + 42 ja + 69 en + 6 punct
        assert len(symbols) == 519 == N_SYMBOLS
        assert len(zh_symbols) == 401
        assert len(ja_symbols) == 42
        assert len(en_symbols) == 69
        assert len(pu_symbols) == 6

    def test_layout(self):
        assert symbols[0] == "_"
        assert symbols[1 : 1 + 401] == zh_symbols
        assert symbols[-6:] == pu_symbols
        # zh block is lexicographically sorted (generation invariant)
        assert zh_symbols == sorted(zh_symbols)

    def test_spot_ids(self):
        assert SYMBOL_TO_ID["_"] == 0
        assert "iaor3" in SYMBOL_TO_ID and "vnr5" in SYMBOL_TO_ID
        assert "pau" in SYMBOL_TO_ID and "AA0" in SYMBOL_TO_ID
        assert len(set(symbols)) == len(symbols)  # no duplicates

    def test_roundtrip(self):
        ids = cleaned_text_to_sequence(["n", "i3", "h", "ao3", "sp"])
        assert [sym_list[i] for i in ids] == ["n", "i3", "h", "ao3", "sp"]


class TestPinyin:
    @pytest.mark.parametrize(
        "syl,phones",
        [
            ("zhuang1", ["zh", "uang1"]),
            ("jun4", ["j", "vn4"]),
            ("qu2", ["q", "v2"]),
            ("liu2", ["l", "iou2"]),
            ("dui4", ["d", "uei4"]),
            ("dun4", ["d", "uen4"]),
            ("zhi1", ["zh", "iii1"]),
            ("zi1", ["z", "ii1"]),
            ("ri4", ["r", "iii4"]),
            ("er2", ["er2"]),
            ("yi1", ["i1"]),
            ("yuan2", ["van2"]),
            ("weng1", ["ueng1"]),
            ("dianr3", ["d", "ianr3"]),
            ("huir4", ["h", "ueir4"]),
            ("yingr1", ["ingr1"]),
            ("nv3", ["n", "v3"]),
            ("lüe4", ["l", "ve4"]),
        ],
    )
    def test_syllables(self, syl, phones):
        assert pinyin_syllable_to_phones(syl) == phones

    def test_all_phones_in_vocab(self):
        # every phone our converter can emit for common syllables is in vocab
        for syl in ["ni3", "hao3", "shi4", "jie4", "zhongr1", "huar4"]:
            for ph in pinyin_syllable_to_phones(syl):
                assert ph in SYMBOL_TO_ID, ph

    def test_unknown_skipped(self):
        assert pinyin_to_phonemes("blarg9 ni3") == ["n", "i3"]


class TestCleaner:
    def test_pinyin_block(self):
        assert text_to_phones("[P]pin1 yin1 zhen1 hao3 wan2[P]") == [
            "p", "in1", "in1", "zh", "en1", "h", "ao3", "uan2",
        ]

    def test_punctuation_mapping(self):
        phones = text_to_phones("[P]ni3 hao3[P]！")
        assert phones[-1] == "!"
        phones = text_to_phones("[P]ni3[P]。")
        assert phones[-1] == "."

    def test_dash_alias_and_invalid_dropped(self):
        # '—' maps to '-' which aliases to 'sp'; unknown symbols dropped
        phones = text_to_phones("[P]ni3[P]—")
        assert phones == ["n", "i3", "sp"]

    def test_sequence_ids_valid(self):
        seq = text_to_sequence("[P]ni3 hao3 shi4 jie4[P]!")
        assert all(0 <= i < N_SYMBOLS for i in seq)
        assert len(seq) == 9

    def test_ellipsis(self):
        assert text_to_phones("[P]ni3[P]...")[-1] == "…"


class TestNormalization:
    def test_cardinals(self):
        assert verbalize_cardinal("0") == "零"
        assert verbalize_cardinal("000") == "零"
        assert verbalize_cardinal("15") == "十五"
        assert verbalize_cardinal("105") == "一百零五"
        assert verbalize_cardinal("1305") == "一千三百零五"
        assert verbalize_cardinal("10005") == "一万零五"
        assert verbalize_cardinal("123456789") == "一亿二千三百四十五万六千七百八十九"

    def test_num2str(self):
        assert num2str("3.20") == "三点二"
        assert num2str(".22") == "零点二二"
        assert num2str("0.5") == "零点五"

    def test_digits(self):
        assert verbalize_digits("2021") == "二零二一"
        assert verbalize_digits("110", alt_one=True) == "幺幺零"

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("2021年5月4日", "二零二一年五月四日"),
            ("下午1:30", "下午一点半"),
            ("温度-3°C", "温度零下三度"),
            ("涨了3/4", "涨了四分之三"),
            ("百分比50%", "百分比百分之五十"),
            ("3~5个", "三到五个"),
            ("13812345678", "幺三八幺二三四五六七八"),
            # 3+ digit bare sequences read digit-by-digit (RE_DEFAULT_NUM),
            # full-width digits normalized first
            ("全角１２３", "一二三"),
            ("编号00078", "零零零七八"),
        ],
    )
    def test_nsw(self, text, expected):
        out = "".join(TextNormalizer().normalize(text))
        assert expected in out, out

    def test_sentence_split(self):
        tn = TextNormalizer()
        sents = tn.split("你好，世界。再见！")
        assert sents == ["你好，", "世界。", "再见！"]


class TestZhLexiconFallback:
    """Hanzi G2P from a user lexicon when pypinyin is absent
    (load_zh_lexicon + longest match + tone sandhi)."""

    def test_lexicon_g2p(self, tmp_path):
        from vispeech_tpu.text import frontends

        lex = tmp_path / "zh.lex"
        lex.write_text(
            "你好 ni3 hao3\n你 ni3\n好 hao3\n世界 shi4 jie4\n这 zhe4\n是 shi4\n"
        )
        saved = dict(frontends._ZH_LEXICON)
        saved_len = frontends._ZH_LEX_MAXLEN
        try:
            frontends.load_zh_lexicon(str(lex))
            out = frontends._lexicon_zh_g2p("你好世界")
            # 你好: third-tone sandhi → ni2 hao3 (word-internal 3-3)
            assert out == ["n", "i2", "h", "ao3", "sh", "iii4", "j", "ie4"]
            out2 = frontends._lexicon_zh_g2p("这是你好,")
            assert out2[-1] == ","
        finally:
            frontends._ZH_LEXICON.clear()
            frontends._ZH_LEXICON.update(saved)
            frontends._ZH_LEX_MAXLEN = saved_len

    def test_missing_hanzi_raises(self, tmp_path):
        import pytest as _pytest

        from vispeech_tpu.text import frontends

        lex = tmp_path / "zh.lex"
        lex.write_text("你 ni3\n")
        saved = dict(frontends._ZH_LEXICON)
        saved_len = frontends._ZH_LEX_MAXLEN
        try:
            frontends.load_zh_lexicon(str(lex))
            with _pytest.raises(frontends.FrontendUnavailable):
                frontends._lexicon_zh_g2p("你猫")
        finally:
            frontends._ZH_LEXICON.clear()
            frontends._ZH_LEXICON.update(saved)
            frontends._ZH_LEX_MAXLEN = saved_len


class TestLexiconGenerator:
    def test_known_syllables(self):
        from vispeech_tpu.text.lexicon import generate_lexicon

        lex = generate_lexicon(with_tone=False)
        assert lex["zhuang"] == "zh uang"
        assert lex["yi"] == " i".strip() or lex["yi"] == "i"
        assert lex["wu"] == "u"
        assert lex["yu"] == "v"
        assert lex["ju"] == "j v"
        assert lex["liu"] == "l iou"
        assert lex["dui"] == "d uei"
        assert lex["lun"] == "l uen"
        assert lex["zi"] == "z ii"
        assert lex["shi"] == "sh iii"
        assert lex["er"] == "er"
        # impossible combinations are absent
        assert "bong" not in lex
        assert "kiu" not in lex

    def test_round_trip_with_parser(self):
        """Every generated toned syllable must parse back to its phones
        (ties lexicon.py and pinyin.py together)."""
        from vispeech_tpu.text.lexicon import generate_lexicon
        from vispeech_tpu.text.pinyin import pinyin_syllable_to_phones

        lex = generate_lexicon(with_tone=True)
        assert len(lex) > 1500
        mismatches = []
        for syllable, phones in lex.items():
            expect = phones.split(" ")
            got = pinyin_syllable_to_phones(syllable)
            if got != expect:
                mismatches.append((syllable, expect, got))
        assert not mismatches, mismatches[:10]


class TestEnNormalization:
    """English normalizer (reference text/frontend/normalizer/)."""

    def test_number_to_words(self):
        from vispeech_tpu.text.en_normalization import number_to_words

        assert number_to_words(0) == "zero"
        assert number_to_words(13) == "thirteen"
        assert number_to_words(21) == "twenty-one"
        assert number_to_words(105) == "one hundred five"
        assert number_to_words(3042) == "three thousand forty-two"
        assert number_to_words(1200000) == "one million two hundred thousand"

    def test_ordinals(self):
        from vispeech_tpu.text.en_normalization import ordinal_to_words

        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(2) == "second"
        assert ordinal_to_words(3) == "third"
        assert ordinal_to_words(12) == "twelfth"
        assert ordinal_to_words(20) == "twentieth"
        assert ordinal_to_words(23) == "twenty-third"
        assert ordinal_to_words(100) == "one hundredth"

    def test_normalize_numbers_cascade(self):
        from vispeech_tpu.text.en_normalization import normalize_numbers

        # commas removed, then verbalized; the year-style grouping applies to
        # any 1000<n<3000 and the dollar expansion's digits are re-expanded
        # by the trailing _number_re pass — both reference behaviors
        # (numbers.py:62-98)
        assert normalize_numbers("1,234 things") == "twelve thirty-four things"
        assert normalize_numbers("4,321 things") == (
            "four thousand three hundred twenty-one things"
        )
        assert normalize_numbers("$2.50") == "two dollars, fifty cents"
        assert normalize_numbers("$1") == "one dollar"
        assert normalize_numbers("£5") == "five pounds"
        # the trailing digits are re-expanded as a whole number, as in the
        # reference cascade ("point fourteen", not "point one four")
        assert normalize_numbers("3.14") == "three point fourteen"
        assert normalize_numbers("the 2nd time") == "the second time"

    def test_year_style_reading(self):
        from vispeech_tpu.text.en_normalization import normalize_numbers

        # inflect group=2 zero='oh' emulation (numbers.py:62-74)
        assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
        assert normalize_numbers("in 1905") == "in nineteen oh five"
        assert normalize_numbers("in 2000") == "in two thousand"
        assert normalize_numbers("in 2005") == "in two thousand five"
        assert normalize_numbers("in 1900") == "in nineteen hundred"

    def test_full_normalize(self):
        from vispeech_tpu.text.en_normalization import normalize

        # accents stripped, lowercased, charset restricted (normalizer.py:21-34)
        assert normalize("Café, 3 items!") == "cafe, three items!"
        assert normalize("He said: i.e. now") == "he said that is now"

    def test_width_folding(self):
        from vispeech_tpu.text.en_normalization import (
            full2half_width,
            half2full_width,
        )

        assert full2half_width("ＡＢＣ　１２３") == "ABC 123"
        assert half2full_width("AB 1") == "ＡＢ　１"

    def test_en_g2p_expands_digits_via_lexicon(self):
        from vispeech_tpu.text import frontends

        saved = dict(frontends._EN_LEXICON)
        frontends._EN_LEXICON.update({
            "twenty": ["T", "W", "EH1", "N", "T", "IY0"],
            "one": ["W", "AH1", "N"],
        })
        try:
            phones = frontends.en_to_phonemes("21")
            assert phones == ["T", "W", "EH1", "N", "T", "IY0", "-",
                              "W", "AH1", "N"]
        finally:
            frontends._EN_LEXICON.clear()
            frontends._EN_LEXICON.update(saved)


class TestPhonetics:
    """Vocab + ARPABET phonologies (reference text/frontend/vocab.py,
    arpabet.py)."""

    def test_vocab_specials_and_order(self):
        from vispeech_tpu.text.phonetics import Vocab

        v = Vocab(["a", "b", "a"])
        assert len(v) == 6  # 4 specials + a, b (dedup)
        assert v.padding_index == 0
        assert v.unk_index == 1
        assert v.start_index == 2
        assert v.end_index == 3
        assert v.lookup("a") == 4 and v.reverse(5) == "b"
        assert v.lookup("MISSING") == v.unk_index  # unk fallback
        v.add_symbols(["c", "b"])
        assert v.lookup("c") == 6 and len(v) == 7

    def test_vocab_without_specials(self):
        from vispeech_tpu.text.phonetics import Vocab

        v = Vocab(["x"], padding_symbol=None, unk_symbol=None,
                  start_symbol=None, end_symbol=None)
        assert len(v) == 1 and v.num_specials == 0
        assert v.padding_index == -1
        import pytest as _pytest
        with _pytest.raises(KeyError):
            v.lookup("missing")

    def test_arpabet_sizes(self):
        from vispeech_tpu.text.phonetics import Arpabet, ArpabetWithStress

        a = Arpabet(backend=lambda s: [])
        assert len(a.phonemes) == 39
        assert a.vocab_size == 47  # 39 + 4 punct + 4 specials
        s = ArpabetWithStress(backend=lambda s: [])
        assert len(s.phonemes) == 69
        assert s.vocab_size == 77

    def test_phoneticize_strips_stress_and_filters(self):
        from vispeech_tpu.text.phonetics import Arpabet, ArpabetWithStress

        fake = lambda s: ["HH", "AH0", "L", "OW1", " ", "@", "!"]
        a = Arpabet(backend=fake)
        assert a.phoneticize("hello!") == ["HH", "AH", "L", "OW", "!"]
        sw = ArpabetWithStress(backend=fake)
        assert sw.phoneticize("hello!") == ["HH", "AH0", "L", "OW1", "!"]

    def test_roundtrip_and_start_end(self):
        from vispeech_tpu.text.phonetics import Arpabet

        a = Arpabet(backend=lambda s: ["K", "AE1", "T"])
        phones = a.phoneticize("cat", add_start_end=True)
        assert phones[0] == "<s>" and phones[-1] == "</s>"
        ids = a.numericalize(phones)
        assert a.reverse(ids) == phones
        assert a("cat") == a.numericalize(["K", "AE", "T"])
