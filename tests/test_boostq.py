"""FunctionScoreQuery.boostByQuery and RegexCompletionQuery roles."""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.functionscore import boost_by_query
from lucene_spark.search.suggest import complete_regex


class TestBoostByQuery:
    def test_matches_brute(self, spark, search_index):
        s = Searcher(search_index)
        base = {d: x for d, x in s.search(A.TermQuery("return"), k=10**6).hits}
        boosted = {d for d, _ in s.search(A.TermQuery("if"), k=10**6).hits}
        got = boost_by_query(
            s, A.TermQuery("return"), A.TermQuery("if"), 3.0, search_index.docs, k=20
        ).collect()
        want = sorted(
            ((d, x * 3.0 if d in boosted else x) for d, x in base.items()),
            key=lambda t: (-t[1], t[0]),
        )[:20]
        assert [(r["doc_id"], round(r["score"], 5)) for r in got] == [
            (d, round(x, 5)) for d, x in want
        ]

    def test_boost_one_is_identity(self, spark, search_index):
        s = Searcher(search_index)
        got = boost_by_query(
            s, A.TermQuery("return"), A.TermQuery("if"), 1.0, search_index.docs, k=10
        ).collect()
        want = s.search(A.TermQuery("return"), k=10).hits
        assert [(r["doc_id"], round(r["score"], 5)) for r in got] == [
            (d, round(x, 5)) for d, x in want
        ]

    def test_negative_boost_rejected(self, spark, search_index):
        with pytest.raises(ValueError, match=">= 0"):
            boost_by_query(
                Searcher(search_index), A.TermQuery("a"), A.TermQuery("b"), -1.0,
                search_index.docs,
            )

    def test_distributed_matches_driver(self, spark, search_index):
        s = Searcher(search_index)
        a = boost_by_query(
            s, A.TermQuery("return"), A.TermQuery("if"), 2.0, search_index.docs, k=10
        ).collect()
        b = boost_by_query(
            s, A.TermQuery("return"), A.TermQuery("if"), 2.0, search_index.docs, k=10,
            mode="distributed",
        ).collect()
        assert [(r["doc_id"], round(r["score"], 5)) for r in a] == [
            (r["doc_id"], round(r["score"], 5)) for r in b
        ]


class TestRegexCompletion:
    def test_matches_term_dictionary(self, spark, search_index):
        got = complete_regex(search_index, "re.*", k=10).collect()
        rows = {
            r["term"]: r["ttf"]
            for r in search_index.term_stats_df.collect()
            if r["term"].startswith("re")
        }
        want = sorted(rows.items(), key=lambda t: (-t[1], t[0]))[:10]
        assert [(r["term"], r["weight"]) for r in got] == want

    def test_anchored(self, spark, search_index):
        # pattern is fully anchored: 'eturn' must not match 'return'
        assert complete_regex(search_index, "eturn").count() == 0


class TestSampledFacets:
    def test_matches_brute_and_amortizes(self, spark, search_index):
        import hashlib

        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.postprocess import facet_counts, facet_counts_sampled

        s = Searcher(search_index)
        got = facet_counts_sampled(
            s, A.TermQuery("return"), search_index.docs, "lang", 0.25
        ).collect()
        match_ids = {d for d, _ in s.search(A.TermQuery("return"), k=10**6).hits}
        sampled = {
            d
            for d in match_ids
            if int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 1_000_000 < 250_000
        }
        langs = {
            r["doc_id"]: r["lang"]
            for r in search_index.docs.select("doc_id", "lang").collect()
        }
        want = {}
        for d in sampled:
            want[langs[d]] = want.get(langs[d], 0) + 1
        assert {r["lang"]: r["cnt"] for r in got} == want
        assert all(r["est"] == round(r["cnt"] / 0.25) for r in got)

    def test_fraction_one_equals_exact(self, spark, search_index):
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.postprocess import facet_counts, facet_counts_sampled

        s = Searcher(search_index)
        a = facet_counts_sampled(s, A.TermQuery("return"), search_index.docs, "lang", 1.0).collect()
        b = facet_counts(s, A.TermQuery("return"), search_index.docs, "lang").collect()
        assert [(r["lang"], r["cnt"], r["est"]) for r in a] == [
            (r["lang"], r["cnt"], r["cnt"]) for r in b
        ]

    def test_bad_fraction(self, spark, search_index):
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.postprocess import facet_counts_sampled

        with pytest.raises(ValueError, match="fraction"):
            facet_counts_sampled(
                Searcher(search_index), A.TermQuery("a"), search_index.docs, "lang", 0.0
            )
