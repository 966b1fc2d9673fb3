"""Korean (nori-role) segmentation — mirrors the public golden subset
of lucene/analysis/nori/src/test/.../TestKoreanTokenizer.java exactly
(surfaces, start/end offsets, posInc/posLength, POS tags and types):
testSeparateNumber, testSpaces, testPartOfSpeechs(+WithPunc),
testFloatingPointNumber, testPartOfSpeechsWithCompound,
testPartOfSpeechsWithInflects, testUnknownWord (+unigram mode),
testUserDict (userdict.txt fixture format), testInterpunct,
testCombining, testReading."""

from __future__ import annotations

from lucene_spark.analysis.korean import (
    make_segmenter_ko,
    reading_form,
    segment,
)


def surfs(toks):
    return [t[0] for t in toks]


def offs(toks):
    return [(t[1], t[2]) for t in toks]


def incs(toks):
    return [t[3] for t in toks]


def lens(toks):
    return [t[4] for t in toks]


def tags(toks):
    return [t[5] for t in toks]


def types(toks):
    return [t[6] for t in toks]


class TestGoldens:
    def test_separate_number(self):
        t = segment("44사이즈")
        assert surfs(t) == ["44", "사이즈"]
        assert offs(t) == [(0, 2), (2, 5)]
        t = segment("９.９사이즈")
        assert surfs(t) == ["９", "９", "사이즈"]
        assert offs(t) == [(0, 1), (2, 3), (3, 6)]
        assert incs(t) == [1, 1, 1]  # dropped punct leaves no gap

    def test_spaces(self):
        t = segment("화학        이외의         것")
        assert surfs(t) == ["화학", "이외", "의", "것"]
        assert offs(t) == [(0, 2), (10, 12), (12, 13), (22, 23)]

    def test_parts_of_speech(self):
        t = segment("화학 이외의 것")
        assert surfs(t) == ["화학", "이외", "의", "것"]
        assert offs(t) == [(0, 2), (3, 5), (5, 6), (7, 8)]
        assert tags(t) == ["NNG", "NNG", "J", "NNB"]
        assert types(t) == ["morpheme"] * 4

    def test_parts_of_speech_with_punc(self):
        t = segment("화학 이외의 것!", discard_punct=False)
        assert surfs(t) == ["화학", " ", "이외", "의", " ", "것", "!"]
        assert offs(t) == [(0, 2), (2, 3), (3, 5), (5, 6), (6, 7), (7, 8), (8, 9)]
        assert tags(t) == ["NNG", "SP", "NNG", "J", "SP", "NNB", "SF"]

    def test_floating_point_number(self):
        t = segment("10.1 인치 모니터", discard_punct=False)
        assert surfs(t) == ["10", ".", "1", " ", "인치", " ", "모니터"]
        assert offs(t) == [(0, 2), (2, 3), (3, 4), (4, 5), (5, 7), (7, 8), (8, 11)]
        t = segment("10.1 인치 모니터")
        assert surfs(t) == ["10", "1", "인치", "모니터"]
        assert offs(t) == [(0, 2), (3, 4), (5, 7), (8, 11)]

    def test_compound(self):
        text = "가락지나물은 한국, 중국, 일본"
        t = segment(text)  # NONE keeps the compound
        assert surfs(t) == ["가락지나물", "은", "한국", "중국", "일본"]
        assert offs(t) == [(0, 5), (5, 6), (7, 9), (11, 13), (15, 17)]
        assert types(t) == ["compound", "morpheme", "morpheme", "morpheme", "morpheme"]
        assert tags(t) == ["NNG", "J", "NNP", "NNP", "NNP"]

        t = segment(text, decompound="discard")
        assert surfs(t) == ["가락지", "나물", "은", "한국", "중국", "일본"]
        assert offs(t) == [(0, 3), (3, 5), (5, 6), (7, 9), (11, 13), (15, 17)]
        assert tags(t) == ["NNG", "NNG", "J", "NNP", "NNP", "NNP"]

        t = segment(text, decompound="mixed")
        assert surfs(t) == ["가락지나물", "가락지", "나물", "은", "한국", "중국", "일본"]
        assert offs(t) == [(0, 5), (0, 3), (3, 5), (5, 6), (7, 9), (11, 13), (15, 17)]
        assert incs(t) == [1, 0, 1, 1, 1, 1, 1]
        assert lens(t) == [2, 1, 1, 1, 1, 1, 1]

    def test_inflect(self):
        t = segment("감싸여")
        assert surfs(t) == ["감싸여"]
        assert offs(t) == [(0, 3)]
        assert types(t) == ["inflect"]
        left, right = t[0][5].split("+")
        assert (left, right) == ("VV", "E")

        t = segment("감싸여", decompound="discard")
        assert surfs(t) == ["감싸이", "어"]
        # contracted form: parts carry the WHOLE surface span
        assert offs(t) == [(0, 3), (0, 3)]
        assert incs(t) == [1, 1]
        assert tags(t) == ["VV", "E"]

        t = segment("감싸여", decompound="mixed")
        assert surfs(t) == ["감싸여", "감싸이", "어"]
        assert offs(t) == [(0, 3), (0, 3), (0, 3)]
        assert incs(t) == [1, 0, 1]
        assert lens(t) == [2, 1, 1]

    def test_unknown_word(self):
        t = segment("2018 평창 동계올림픽대회")
        assert surfs(t) == ["2018", "평창", "동계", "올림픽", "대회"]
        assert offs(t) == [(0, 4), (5, 7), (8, 10), (10, 13), (13, 15)]
        assert tags(t) == ["SN", "NNP", "NNP", "NNP", "NNG"]

        t = segment("2018 평창 동계올림픽대회", unigrams=True)
        assert surfs(t) == ["2", "0", "1", "8", "평창", "동계", "올림픽", "대회"]
        assert offs(t) == [(0, 1), (1, 2), (2, 3), (3, 4), (5, 7), (8, 10), (10, 13), (13, 15)]
        assert tags(t)[:4] == ["SY"] * 4

    def test_user_dict(self):
        user = ("c++", "C샤프", "세종", "세종시 세종 시", "대한민국날씨", "대한민국", "날씨", "21세기대한민국", "세기")
        t = segment("c++ 프로그래밍 언어", user_words=user)
        assert surfs(t) == ["c++", "프로그래밍", "언어"]
        assert offs(t) == [(0, 3), (4, 9), (10, 12)]
        assert tags(t) == ["NNG", "NNG", "NNG"]

        t = segment("정부세종청사", user_words=user, decompound="discard")
        assert surfs(t) == ["정부", "세종", "청사"]
        assert offs(t) == [(0, 2), (2, 4), (4, 6)]
        assert tags(t) == ["NNG", "NNG", "NNG"]

        t = segment("대한민국날씨", user_words=user)
        assert surfs(t) == ["대한민국날씨"] and offs(t) == [(0, 6)]
        t = segment("21세기대한민국", user_words=user)
        assert surfs(t) == ["21세기대한민국"] and offs(t) == [(0, 8)]

    def test_user_dict_compound_decompose(self):
        user = ("세종시 세종 시",)
        t = segment("세종시", user_words=user, decompound="discard")
        assert surfs(t) == ["세종", "시"]
        assert offs(t) == [(0, 2), (2, 3)]
        t = segment("세종시", user_words=user)
        assert surfs(t) == ["세종시"] and types(t) == ["compound"]

    def test_interpunct(self):
        t = segment("도로ㆍ지반ㆍ수자원ㆍ건설환경ㆍ건축ㆍ화재설비연구")
        assert surfs(t) == ["도로", "지반", "수자원", "건설", "환경", "건축", "화재", "설비", "연구"]
        assert offs(t) == [
            (0, 2), (3, 5), (6, 9), (10, 12), (12, 14), (15, 17), (18, 20), (20, 22), (22, 24),
        ]
        assert incs(t) == [1] * 9

    def test_combining(self):
        t = segment("Ба̀лтичко мо̑ре")
        assert surfs(t) == ["Ба̀лтичко", "мо̑ре"]
        assert offs(t) == [(0, 9), (10, 15)]
        assert tags(t) == ["SL", "SL"]
        t = segment("ka̠k̚t͡ɕ͈a̠k̚")
        assert surfs(t) == ["ka̠k̚t͡ɕ͈a̠k̚"]
        assert offs(t) == [(0, 13)]
        assert tags(t) == ["SL"]
        t = segment("εἰμί")
        assert surfs(t) == ["εἰμί"] and offs(t) == [(0, 4)] and tags(t) == ["SL"]

    def test_reading(self):
        assert reading_form("喜悲哀歡") == "희비애환"
        assert reading_form("五朔居廬") == "오삭거려"
        assert reading_form("가늘라") == "가늘라"


class TestAnalyzerHook:
    def test_expander_contract(self):
        seg = make_segmenter_ko()
        assert seg("가락지나물은") == ["가락지", "나물", "은"]
        assert seg("Hello") == ["hello"]  # non-Korean lowercases through
        seg_none = make_segmenter_ko(decompound="none")
        assert seg_none("가락지나물은") == ["가락지나물", "은"]

    def test_determinism_and_memo(self):
        seg = make_segmenter_ko()
        a = seg("동계올림픽대회")
        assert a == seg("동계올림픽대회") == ["동계", "올림픽", "대회"]


class TestMixedIndex:
    """DecompoundMode.MIXED as the index-time stacked stage
    (analyzer="ko_mixed"): original COMPOUND/INFLECT surfaces stack
    posInc-0 over the DISCARD parts — both the compound and its parts
    match, mirroring the reference's analyzerDecompoundKeep streams."""

    def test_mixed_stream_shapes(self):
        from lucene_spark.analysis.korean import mixed_stream, segment

        t = segment("가락지나물은", decompound="discard")
        toks, sts, ens = [x[0] for x in t], [x[1] for x in t], [x[2] for x in t]
        got = mixed_stream(toks, list(range(len(t))), starts=sts, ends=ens)
        assert got == (
            ["가락지", "가락지나물", "나물", "은"],
            [0, 0, 1, 2],
            [False, True, False, False],
            [0, 0, 3, 5],
            [3, 5, 5, 6],
        )
        t = segment("감싸여", decompound="discard")
        toks, sts, ens = [x[0] for x in t], [x[1] for x in t], [x[2] for x in t]
        got = mixed_stream(toks, list(range(len(t))), starts=sts, ends=ens)
        assert got == (
            ["감싸이", "감싸여", "어"], [0, 0, 1], [False, True, False], [0, 0, 0], [3, 3, 3]
        )
        # offset gap (dropped punct) blocks the compound re-join
        got = mixed_stream(["가락지", "나물"], [0, 1], starts=[0, 4], ends=[3, 6])
        assert got[0] == ["가락지", "나물"] and not any(got[2])

    def test_mixed_index_matches_compound_and_parts(self, spark, tmp_path):
        import pandas as pd

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        docs = ["가락지나물은 한국", "나물 화학", "감싸여 언어", "한국의 정부"]
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "repo": "r",
                "path": [str(i) for i in range(len(docs))],
                "commit": "c",
                "lang": "ko",
                "content": docs,
            }
        )
        d = str(tmp_path / "komix")
        IndexBuilder(
            spark, IndexConfig(docs_per_chunk=4, term_buckets=2, positions=True, analyzer="ko_mixed")
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        ix = SearchIndex(spark, d)
        s = Searcher(ix)
        hits = lambda q: sorted(h[0] for h in s.search(q, k=10).hits)
        # the ORIGINAL surfaces are real postings (stacked posInc-0)
        stats = ix.term_stats(["가락지나물", "감싸여", "가락지", "나물", "감싸이"])
        assert stats["가락지나물"][0] == 1  # compound: df 1 (doc 0 only)
        assert stats["감싸여"][0] == 1
        assert stats["가락지"][0] == 1 and stats["감싸이"][0] == 1
        assert stats["나물"][0] == 2
        # query-side analysis expands the compound through the same
        # chain (analyzeMultiBoolean), so both docs match — but doc 0,
        # holding the stacked compound AND both parts, ranks first
        td = s.search(A.TermQuery("가락지나물"), k=10)
        assert sorted(h[0] for h in td.hits) == [0, 1]
        assert td.hits[0][0] == 0
        assert hits(A.TermQuery("가락지")) == [0]
        assert hits(A.TermQuery("감싸이")) == [2]
        # the stacked compound sits AT the first part's position:
        # span [가락지나물 .. 은] within the raw positions matches doc 0
        ctx_hits = s.search(A.SpanNearQuery(("가락지나물", "은"), slop=2, in_order=True), k=10)
        assert sorted(h[0] for h in ctx_hits.hits) == [0]
