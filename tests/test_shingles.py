"""ShingleFilter / CommonGramsFilter golden token-stream tests.

Expectations mirror the reference test arrays verbatim:
/root/reference/lucene/analysis/common/src/test/org/apache/lucene/
analysis/shingle/TestShingleFilter.java:36-180,715-760 and
.../commongrams/TestCommonGramsFilter.java:138-178.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.analysis.shingles import common_grams_stream, shingle_stream

TEST_TOKENS = ["please", "divide", "this", "sentence", "into", "shingles"]
TEST_OFFS = [(0, 6), (7, 13), (14, 18), (19, 27), (28, 32), (33, 39)]


def _stream(tokens, positions, starts=None, ends=None, **kw):
    r = shingle_stream(tokens, positions, starts=starts, ends=ends, **kw)
    if starts is not None:
        t, p, ov, s, e = r
        incs = [0 if o else 1 for o in ov]
        return list(zip(t, incs, s, e))
    t, p, ov = r
    return list(zip(t, [0 if o else 1 for o in ov]))


def _posincs(positions, overlaps):
    """absolute positions + overlap flags → Lucene posInc sequence"""
    out, prev = [], -1
    for p, ov in zip(positions, overlaps):
        out.append(0 if ov else p - prev)
        if not ov:
            prev = p
    return out


class TestShingleGoldens:
    def test_bigram(self):
        toks, poss, ov, s, e = shingle_stream(
            TEST_TOKENS, list(range(6)),
            starts=[o[0] for o in TEST_OFFS], ends=[o[1] for o in TEST_OFFS],
        )
        want = [
            ("please", 0, 6), ("please divide", 0, 13),
            ("divide", 7, 13), ("divide this", 7, 18),
            ("this", 14, 18), ("this sentence", 14, 27),
            ("sentence", 19, 27), ("sentence into", 19, 32),
            ("into", 28, 32), ("into shingles", 28, 39),
            ("shingles", 33, 39),
        ]
        assert list(zip(toks, s, e)) == want
        assert _posincs(poss, ov) == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1]

    def test_bigram_with_holes(self):
        # please@0 divide@1 <hole> sentence@3 <hole> shingles@5
        toks, poss, ov, s, e = shingle_stream(
            ["please", "divide", "sentence", "shingles"], [0, 1, 3, 5],
            starts=[0, 7, 19, 33], ends=[6, 13, 27, 39],
        )
        want = [
            ("please", 0, 6), ("please divide", 0, 13),
            ("divide", 7, 13), ("divide _", 7, 19),
            ("_ sentence", 19, 27),
            ("sentence", 19, 27), ("sentence _", 19, 33),
            ("_ shingles", 33, 39),
            ("shingles", 33, 39),
        ]
        assert list(zip(toks, s, e)) == want
        assert _posincs(poss, ov) == [1, 0, 1, 0, 1, 1, 0, 1, 1]

    def test_bigram_without_unigrams(self):
        toks, poss, ov = shingle_stream(
            TEST_TOKENS, list(range(6)), output_unigrams=False
        )
        assert toks == [
            "please divide", "divide this", "this sentence",
            "sentence into", "into shingles",
        ]
        assert _posincs(poss, ov) == [1, 1, 1, 1, 1]

    def test_bigram_with_holes_without_unigrams(self):
        toks, poss, ov = shingle_stream(
            ["please", "divide", "sentence", "shingles"], [0, 1, 3, 5],
            output_unigrams=False,
        )
        assert toks == ["please divide", "divide _", "_ sentence", "sentence _", "_ shingles"]
        assert _posincs(poss, ov) == [1, 1, 1, 1, 1]

    def test_trigram(self):
        toks, poss, ov = shingle_stream(TEST_TOKENS, list(range(6)), max_size=3)
        assert toks == [
            "please", "please divide", "please divide this",
            "divide", "divide this", "divide this sentence",
            "this", "this sentence", "this sentence into",
            "sentence", "sentence into", "sentence into shingles",
            "into", "into shingles",
            "shingles",
        ]
        assert _posincs(poss, ov) == [1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1]

    def test_trigram_without_unigrams(self):
        toks, poss, ov = shingle_stream(
            TEST_TOKENS, list(range(6)), max_size=3, output_unigrams=False
        )
        assert toks == [
            "please divide", "please divide this",
            "divide this", "divide this sentence",
            "this sentence", "this sentence into",
            "sentence into", "sentence into shingles",
            "into shingles",
        ]
        assert _posincs(poss, ov) == [1, 0, 1, 0, 1, 0, 1, 0, 1]

    def test_single_token(self):
        toks, poss, ov = shingle_stream(["please"], [0])
        assert toks == ["please"] and _posincs(poss, ov) == [1]
        toks, poss, ov = shingle_stream(["please"], [0], output_unigrams=False)
        assert toks == []
        toks, poss, ov = shingle_stream(
            ["please"], [0], output_unigrams=False, output_unigrams_if_no_shingles=True
        )
        assert toks == ["please"]

    def test_empty(self):
        assert shingle_stream([], [])[0] == []

    def test_all_filler_shingles_skipped(self):
        # a@0 <2 holes> b@3: trigram window (_ , _) would be all-filler
        toks, poss, ov = shingle_stream(["a", "b"], [0, 3], max_size=2)
        assert "_ _" not in toks
        assert toks == ["a", "a _", "_ b", "b"]


class TestCommonGramsGoldens:
    COMMON = {"of", "the", "s"}

    def _run(self, words):
        toks, poss, ov = common_grams_stream(
            words, list(range(len(words))), self.COMMON
        )
        return toks, _posincs(poss, ov)

    def test_reference_cases(self):
        assert self._run(["the"]) == (["the"], [1])
        assert self._run(["foo"]) == (["foo"], [1])
        assert self._run(["brown", "fox"]) == (["brown", "fox"], [1, 1])
        assert self._run(["the", "fox"]) == (["the", "the_fox", "fox"], [1, 0, 1])
        assert self._run(["fox", "of"]) == (["fox", "fox_of", "of"], [1, 0, 1])
        assert self._run(["of", "the"]) == (["of", "of_the", "the"], [1, 0, 1])
        assert self._run(["quick", "brown", "fox"]) == (
            ["quick", "brown", "fox"], [1, 1, 1])
        assert self._run(["quick", "brown", "the"]) == (
            ["quick", "brown", "brown_the", "the"], [1, 1, 0, 1])
        assert self._run(["quick", "the", "fox"]) == (
            ["quick", "quick_the", "the", "the_fox", "fox"], [1, 0, 1, 0, 1])
        assert self._run(["the", "quick", "the"]) == (
            ["the", "the_quick", "quick", "quick_the", "the"], [1, 0, 1, 0, 1])

    def test_pairs_form_across_holes(self):
        # the reference buffers the previous term and never consults
        # posInc for pair formation ("We build n-grams before and
        # after stopwords", CommonGramsFilter.incrementToken) — a
        # position hole between stream-adjacent tokens still grams
        toks, poss, ov = common_grams_stream(["fox", "the"], [0, 2], self.COMMON)
        assert toks == ["fox", "fox_the", "the"]
        assert poss == [0, 0, 2]
        assert ov == [False, True, False]


class TestShingledIndex:
    """End-to-end: a shingled index holds shingles as first-class
    postings (tf = adjacency count, df = docs with the adjacency),
    norms stay unigram-discounted, sum_ttf counts every posting —
    the reference's exact statistics for shingled fields."""

    import pytest as _pytest

    @_pytest.fixture(scope="class")
    def sh_index(self, tmp_path_factory, spark, corpus_pdf):
        import shutil

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex

        pdf = corpus_pdf.copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("shix"))
        IndexBuilder(
            spark,
            IndexConfig(
                docs_per_chunk=128, term_buckets=4, shingles=(2, 2), positions=True
            ),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        yield SearchIndex(spark, d), pdf
        shutil.rmtree(d, ignore_errors=True)

    def test_shingle_term_equals_adjacency(self, spark, sh_index):
        from lucene_spark.analysis.tokenizer import tokenize
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        ix, pdf = sh_index
        s = Searcher(ix)
        td = s.search(A.TermQuery("return if"), k=10**6)
        got = sorted(d for d, _ in td.hits)
        want = []
        for i, text in enumerate(pdf["content"]):
            toks = tokenize(text)
            if any(a == "return" and b == "if" for a, b in zip(toks, toks[1:])):
                want.append(i)
        assert got == want and len(want) > 0

    def test_unigrams_still_searchable(self, spark, sh_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        ix, pdf = sh_index
        s = Searcher(ix)
        td = s.search(A.TermQuery("return"), k=10**6)
        assert td.total_hits == sum("return" in t for t in pdf["content"])
        # positions of unigrams unchanged: exact phrase still works and
        # equals the shingle-term match set
        ph = s.search(A.PhraseQuery(("return", "if")), k=10**6)
        sh = s.search(A.TermQuery("return if"), k=10**6)
        assert sorted(d for d, _ in ph.hits) == sorted(d for d, _ in sh.hits)

    def test_statistics_split(self, spark, sh_index):
        """norms = unigram dl (discountOverlaps); sum_ttf counts every
        emitted token — shingles AND the filler shingles around holes
        left by dropped >255-char tokens."""
        from lucene_spark.analysis.shingles import shingle_stream
        from lucene_spark.analysis.tokenizer import tokenize, tokenize_with_positions

        ix, pdf = sh_index
        dls = []
        want_sum = 0
        for t in pdf["content"]:
            toks, poss = tokenize_with_positions(t)
            st, _sp, _ov = shingle_stream(toks, poss)
            want_sum += len(st)
            dls.append(len(toks))
        assert ix.stats.sum_total_term_freq == want_sum
        # and BM25 scores agree with hand-computed using that split
        import math

        from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE, int_to_byte4
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(ix)
        hits = s.search(A.TermQuery("return if"), k=3).hits
        tok = tokenize
        n = len(pdf)
        tfs = {}
        for i, text in enumerate(pdf["content"]):
            ts = tok(text)
            c = sum(1 for a, b in zip(ts, ts[1:]) if a == "return" and b == "if")
            if c:
                tfs[i] = c
        df = len(tfs)
        avgdl = want_sum / n
        w = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, sc in hits:
            dlen = NORM_LENGTH_TABLE[int_to_byte4(dls[d])]
            want = w - w / (1 + tfs[d] * (1.0 / (1.2 * ((1 - 0.75) + 0.75 * dlen / avgdl))))
            assert abs(sc - want) < 1e-4, (d, sc, want)


class TestCommonGramsIndex:
    def test_gram_term_matches(self, spark, corpus_pdf, tmp_path_factory):
        import shutil

        from lucene_spark.analysis.tokenizer import tokenize
        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        pdf = corpus_pdf.copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("cgix"))
        IndexBuilder(
            spark,
            IndexConfig(
                docs_per_chunk=128, term_buckets=4, common_grams=("if", "return")
            ),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        s = Searcher(SearchIndex(spark, d))
        td = s.search(A.TermQuery("return_if"), k=10**6)
        got = sorted(dd for dd, _ in td.hits)
        want = []
        for i, text in enumerate(pdf["content"]):
            toks = tokenize(text)
            if any(a == "return" and b == "if" for a, b in zip(toks, toks[1:])):
                want.append(i)
        assert got == want and len(want) > 0
        shutil.rmtree(d, ignore_errors=True)


class TestNGramStream:
    """NGramTokenFilter / EdgeNGramTokenFilter goldens (the javadoc
    contract: 'abc' with 1..3 grams gives a, ab, abc, b, bc, c; all
    grams stack at the token position; offsets unmodified)."""

    def test_full_ngram_order(self):
        from lucene_spark.analysis.shingles import ngram_stream

        toks, poss, ov = ngram_stream(["abc"], [0], 1, 3)
        assert toks == ["a", "ab", "abc", "b", "bc", "c"]
        assert _posincs(poss, ov) == [1, 0, 0, 0, 0, 0]

    def test_edge_ngram(self):
        from lucene_spark.analysis.shingles import ngram_stream

        toks, poss, ov = ngram_stream(["hello", "hi"], [0, 1], 2, 4, edge=True)
        assert toks == ["he", "hel", "hell", "hi"]
        assert _posincs(poss, ov) == [1, 0, 0, 1]

    def test_preserve_original(self):
        from lucene_spark.analysis.shingles import ngram_stream

        # too short without preserve: nothing (increment carries)
        toks, poss, ov = ngram_stream(["a", "xyz"], [0, 1], 2, 2)
        assert toks == ["xy", "yz"]
        assert poss == [1, 1]
        toks, poss, ov = ngram_stream(["a", "xyz"], [0, 1], 2, 2, preserve_original=True)
        assert toks == ["a", "xy", "yz", "xyz"]

    def test_offsets_whole_token(self):
        from lucene_spark.analysis.shingles import ngram_stream

        toks, poss, ov, s, e = ngram_stream(
            ["ab"], [0], 1, 2, starts=[5], ends=[7]
        )
        assert toks == ["a", "ab", "b"]
        assert s == [5, 5, 5] and e == [7, 7, 7]


class TestEdgeNGramIndex:
    def test_prefix_search_as_you_type(self, spark, corpus_pdf, tmp_path_factory):
        """edge-ngram index: the gram term 'ret' matches exactly the
        docs containing a token with that prefix (>= gram length)."""
        import shutil

        from lucene_spark.analysis.tokenizer import tokenize
        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        pdf = corpus_pdf.head(80).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("engix"))
        IndexBuilder(
            spark,
            IndexConfig(docs_per_chunk=128, term_buckets=4, edge_ngrams=(1, 4)),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        s = Searcher(SearchIndex(spark, d))
        got = sorted(dd for dd, _ in s.search(A.TermQuery("ret"), k=10**6).hits)
        want = [
            i
            for i, t in enumerate(pdf["content"])
            if any(tok.startswith("ret") for tok in tokenize(t))
        ]
        assert got == want and got
        shutil.rmtree(d, ignore_errors=True)


class TestCheckIndexStacked:
    def test_check_index_on_stacked_indexes(self, spark, corpus_pdf, tmp_path_factory):
        """CheckIndex must hold on stacked-token indexes: the sum_ttf
        cross-check comes from the term dictionary there (norms are
        discounted by design)."""
        import shutil

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.check import check_index
        from lucene_spark.index.reader import SearchIndex

        pdf = corpus_pdf.head(60).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        for cfg in (
            IndexConfig(docs_per_chunk=128, term_buckets=4, shingles=(2, 2)),
            IndexConfig(docs_per_chunk=128, term_buckets=4, edge_ngrams=(1, 3)),
        ):
            d = str(tmp_path_factory.mktemp("ckix"))
            IndexBuilder(spark, cfg).build(
                spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False
            )
            rep = check_index(SearchIndex(spark, d))
            assert rep["status"] == "ok", rep
            shutil.rmtree(d, ignore_errors=True)


class TestCoPositionedQueries:
    """Stacked indexes put DISTINCT terms on the same position; the
    flat interval kernels detect the collision and fall back to the
    tree evaluator (clamped gaps), so queries mixing unigrams and
    shingle terms neither crash nor diverge between paths."""

    def test_unordered_interval_over_unigram_and_shingle(self, spark, corpus_pdf, tmp_path_factory):
        import shutil

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.intervals import (
            IMaxGaps,
            IOrdered,
            ITerm,
            IUnordered,
        )

        pdf = corpus_pdf.head(50).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("copix"))
        IndexBuilder(
            spark, IndexConfig(docs_per_chunk=128, term_buckets=4, shingles=(2, 2))
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        s = Searcher(SearchIndex(spark, d))
        # 'return' and 'return if' START at the same positions (stacked)
        q = A.IntervalQuery(IMaxGaps(2, IUnordered((ITerm("return"), ITerm("return if")))))
        td = s.search(q, k=10)
        assert td.hits, "co-positioned unordered interval must match"
        assert all(np.isfinite(sc) and sc > 0 for _, sc in td.hits)
        # ordered variant and spannear across the same pair also run clean
        q2 = A.IntervalQuery(IMaxGaps(4, IOrdered((ITerm("return if"), ITerm("else")))))
        td2 = s.search(q2, k=5)
        for _, sc in td2.hits:
            assert np.isfinite(sc)
        td3 = s.search(
            A.SpanNearQuery(("return", "return if"), slop=3, in_order=False), k=5
        )
        for _, sc in td3.hits:
            assert np.isfinite(sc) and sc > 0
        shutil.rmtree(d, ignore_errors=True)


class TestStackedWithExtraFields:
    def test_primary_stats_exclude_extra_fields(self, spark, corpus_pdf, tmp_path_factory):
        """shingles + extra_fields: the primary field's sum_ttf counts
        primary postings only (prefixed extra-field postings excluded)."""
        import shutil

        from lucene_spark.analysis.shingles import shingle_stream
        from lucene_spark.analysis.tokenizer import tokenize_with_positions
        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.check import check_index
        from lucene_spark.index.reader import SearchIndex

        pdf = corpus_pdf.head(40).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        pdf["title"] = pdf["content"].str.split().str[:5].str.join(" ")
        d = str(tmp_path_factory.mktemp("sxfix"))
        IndexBuilder(
            spark,
            IndexConfig(
                docs_per_chunk=128, term_buckets=4, shingles=(2, 2), extra_fields=("title",)
            ),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        ix = SearchIndex(spark, d)
        want = 0
        for t in pdf["content"]:
            toks, poss = tokenize_with_positions(t)
            want += len(shingle_stream(toks, poss)[0])
        assert ix.stats.sum_total_term_freq == want
        assert check_index(ix)["status"] == "ok"
        shutil.rmtree(d, ignore_errors=True)
