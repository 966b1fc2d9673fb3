"""Chinese (smartcn role) — mirrors the public TestSmartChineseAnalyzer
golden subset exactly (surfaces, offsets, position increments):
testChineseStopWordsDefault(+TwoPhrases/IdeoSpace), testChineseStopWordsOff,
testChineseStopWords2, testMixedLatinChinese, testNumerics, testFullWidth,
testDelimiters, testNonChinese, testOOV, testOffsets, testSurrogatePairCharacter.
"""

from __future__ import annotations

from lucene_spark.analysis.chinese import make_segmenter_zh, segment


def surfs(t):
    return [x[0] for x in t]


def offs(t):
    return [(x[1], x[2]) for x in t]


def incs(t):
    return [x[3] for x in t]


BASE = ["我", "购买", "了", "道具", "和", "服装"]


class TestGoldens:
    def test_stopwords_default(self):
        assert surfs(segment("我购买了道具和服装。")) == BASE

    def test_two_phrases(self):
        assert surfs(segment("我购买了道具和服装。 我购买了道具和服装。")) == BASE + BASE

    def test_two_phrases_ideographic_space(self):
        assert surfs(segment("我购买了道具和服装　我购买了道具和服装。")) == BASE + BASE

    def test_stopwords_off_punct_to_comma(self):
        assert surfs(segment("我购买了道具和服装。", stopwords=False)) == BASE + [","]

    def test_stopword_position_increment(self):
        t = segment("Title:San")  # ':' is a stopword
        assert surfs(t) == ["titl", "san"]
        assert offs(t) == [(0, 5), (6, 9)]
        assert incs(t) == [1, 2]

    def test_mixed_latin(self):
        t = segment("我购买 Tests 了道具和服装")
        assert surfs(t) == ["我", "购买", "test", "了", "道具", "和", "服装"]
        # testReusableTokenStream offsets, verbatim
        assert offs(t) == [(0, 1), (1, 3), (4, 9), (10, 11), (11, 13), (13, 14), (14, 16)]

    def test_numerics(self):
        assert surfs(segment("我购买 Tests 了道具和服装1234")) == [
            "我", "购买", "test", "了", "道具", "和", "服装", "1234",
        ]

    def test_full_width(self):
        assert surfs(segment("我购买 Ｔｅｓｔｓ 了道具和服装１２３４")) == [
            "我", "购买", "test", "了", "道具", "和", "服装", "1234",
        ]

    def test_presentation_form_delimiters(self):
        assert surfs(segment("我购买︱ Tests 了道具和服装")) == [
            "我", "购买", "test", "了", "道具", "和", "服装",
        ]

    def test_non_chinese_scripts_per_char(self):
        assert surfs(segment("我购买 روبرتTests 了道具和服装")) == [
            "我", "购买", "ر", "و", "ب", "ر", "ت", "test", "了", "道具", "和", "服装",
        ]

    def test_oov_single_characters(self):
        assert surfs(segment("优素福·拉扎·吉拉尼")) == [
            "优", "素", "福", "拉", "扎", "吉", "拉", "尼",
        ]
        assert surfs(segment("优素福拉扎吉拉尼")) == [
            "优", "素", "福", "拉", "扎", "吉", "拉", "尼",
        ]

    def test_offsets(self):
        t = segment("我购买了道具和服装")
        assert surfs(t) == BASE
        assert offs(t) == [(0, 1), (1, 3), (3, 4), (4, 6), (6, 7), (7, 9)]

    def test_surrogate_pair_characters(self):
        # the exact codepoints of the reference golden's surrogate
        # pairs: D872DF3B→U+2CB3B, D872DF4A→U+2CB4A, D872DF73→U+2CB73,
        # D872DF5B→U+2CB5B, U+9FCF, D86DDFFC→U+2B7FC, D872DF2D→U+2CB2D,
        # U+9FD4
        s = (
            "\U0002cb3b\U0002cb4a\U0002cb73\U0002cb5b"
            "鿏\U0002b7fc\U0002cb2d鿔"
        )
        t = segment(s)
        assert surfs(t) == list(s)
        assert offs(t) == [(i, i + 1) for i in range(8)]


class TestAnalyzerHook:
    def test_zh_chain(self):
        from lucene_spark.analysis.tokenizer import tokenize

        assert tokenize("我购买了道具和服装。 Tests", stem="zh") == BASE + ["test"]

    def test_user_words(self):
        seg = make_segmenter_zh(("道具和",))
        # user word joins the lattice and wins over the fixture split
        assert seg("道具和服装") == ["道具和", "服装"]

    def test_determinism(self):
        seg = make_segmenter_zh()
        assert seg("我购买了道具和服装") == seg("我购买了道具和服装") == BASE
