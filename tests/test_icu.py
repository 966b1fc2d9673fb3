"""ICU normalization (ICUNormalizer2Filter role) — mirrors the public
TestICUNormalizer2Filter.java goldens exactly, plus the analyzer-chain
integration ("icu" stem: standard tokenizer → nfkc_cf)."""

from __future__ import annotations

from lucene_spark.analysis.icu import icu_normalize
from lucene_spark.analysis.tokenizer import tokenize


class TestGoldens:
    def test_case_folding(self):
        # testDefaults, reference goldens verbatim
        assert [icu_normalize(w) for w in "This is a test".split()] == [
            "this", "is", "a", "test",
        ]
        assert icu_normalize("Ruß") == "russ"
        assert icu_normalize("ΜΆΪΟΣ") == "μάϊοσ"
        assert icu_normalize("Μάϊος") == "μάϊοσ"

    def test_supplementary_case_folding(self):
        assert icu_normalize("\U00010416") == "\U0001043E"  # 𐐖 → 𐐾 (Deseret)

    def test_compatibility_normalization(self):
        assert icu_normalize("ﴳﴺﰧ") == "طمطمطم"  # Arabic presentation forms
        assert icu_normalize("ＴＡＢＬＥ") == "table"  # fullwidth + case
        assert icu_normalize("ﬁle") == "file"  # ligature

    def test_ignorable_removal(self):
        assert icu_normalize("क्‍ष") == "क्ष"  # ZWJ removed
        assert icu_normalize("a­b﻿c") == "abc"  # SHY, ZWNBSP
        assert icu_normalize("a️") == "a"  # variation selector

    def test_alternate_nfd(self):
        # testAlternate: decompose é into e + combining acute
        assert icu_normalize("é", mode="nfd") == "é"
        assert icu_normalize("é", mode="nfc") == "é"

    def test_unknown_mode_rejected(self):
        import pytest

        with pytest.raises(ValueError):
            icu_normalize("x", mode="nfq")


class TestAnalyzerChain:
    def test_icu_stem_tokenizes_and_normalizes(self):
        assert tokenize("ＴＡＢＬＥ ＨＡＳＨ Ruß", stem="icu") == ["table", "hash", "russ"]

    def test_all_ignorable_token_removed(self):
        # U+3164 HANGUL FILLER is a LETTER (Lo) and a default
        # ignorable: it tokenizes, then normalizes to "" and is
        # removed by the chain (the StopFilter-style None emission)
        assert tokenize("table ㅤ hash", stem="icu") == ["table", "hash"]
        assert icu_normalize("ㅤ") == ""
