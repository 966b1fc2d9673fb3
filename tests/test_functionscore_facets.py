"""FunctionScoreQuery rescoring + range/taxonomy facets + drill-down.

Brute-force oracles: re-derive everything in Python from the fixture
corpus and the OracleIndex BM25 scores (same float32 shapes as the
engine), then compare rank-for-rank.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.functionscore import boost_by_value, function_score
from lucene_spark.search.postprocess import drill_down, facet_range_counts, taxonomy_counts


@pytest.fixture(scope="module")
def searcher(search_index):
    return Searcher(search_index)


@pytest.fixture(scope="module")
def ordered(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


class TestFunctionScore:
    def test_rescore_by_docid_expr(self, spark, searcher, search_index, oracle):
        q = A.TermQuery("return")
        got = function_score(
            searcher, q, "_score * (1 + doc_id % 7)", search_index.docs, k=10
        ).collect()
        hits = oracle.top_k(q, k=10**9)
        want = sorted(
            ((float(s) * (1 + d % 7), d) for d, s in hits), key=lambda t: (-t[0], t[1])
        )[:10]
        assert [(r["rank"], r["doc_id"]) for r in got] == [
            (i + 1, d) for i, (_s, d) in enumerate(want)
        ]
        for r, (s, _d) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-5)

    def test_rescore_with_doc_column(self, spark, searcher, search_index, oracle, ordered):
        # expression over a DOC column (DoubleValuesSource bound field):
        # relevance + log(1 + stored path length)
        q = A.TermQuery("return")
        got = function_score(
            searcher, q, "_score + ln(1 + length(path))", search_index.docs, k=10
        ).collect()
        plen = {i: len(ordered.loc[i, "path"]) for i in range(len(ordered))}
        hits = oracle.top_k(q, k=10**9)
        want = sorted(
            ((float(s) + math.log(1 + plen[d]), d) for d, s in hits),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        assert [r["doc_id"] for r in got] == [d for _s, d in want]
        for r, (s, _d) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-5)

    def test_boost_by_value_matches_function_score(self, spark, searcher, search_index):
        q = A.TermQuery("merge")
        a = boost_by_value(searcher, q, "(doc_id % 5 + 1)", search_index.docs, k=5).collect()
        b = function_score(
            searcher, q, "_score * (doc_id % 5 + 1)", search_index.docs, k=5
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


class TestQueryRescorer:
    """QueryRescorer.java:36-104 — second-pass reweighting of the
    first-pass top-N, vs a from-definition float32 brute force."""

    def _brute(self, oracle, first_hits, second_q, weight, top_n):
        smap = oracle.score(second_q)
        out = []
        for d, s in first_hits:
            c = np.float32(s)
            if d in smap:
                c = np.float32(c + np.float32(np.float32(weight) * smap[d]))
            out.append((int(d), float(c)))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:top_n]

    def test_matches_brute_force(self, searcher, oracle):
        from lucene_spark.search.postprocess import rescore

        first = searcher.search(A.TermQuery("return"), k=25)
        got = rescore(searcher, first, A.TermQuery("if"), top_n=10, weight=2.0)
        want = self._brute(oracle, first.hits, A.TermQuery("if"), 2.0, 10)
        assert [(d, np.float32(s)) for d, s in got.hits] == [
            (d, np.float32(s)) for d, s in want
        ]
        # rescoring reorders; it never changes the match count
        assert got.total_hits == first.total_hits

    def test_second_query_can_be_composite(self, searcher, oracle):
        from lucene_spark.search.postprocess import rescore

        second = A.PhraseQuery(("return", "if"))
        first = searcher.search(A.TermQuery("int"), k=20)
        got = rescore(searcher, first, second, top_n=8, weight=0.5)
        want = self._brute(oracle, first.hits, second, 0.5, 8)
        assert [(d, np.float32(s)) for d, s in got.hits] == [
            (d, np.float32(s)) for d, s in want
        ]

    def test_no_second_matches_keeps_first_order(self, searcher):
        from lucene_spark.search.postprocess import rescore

        first = searcher.search(A.TermQuery("return"), k=10)
        got = rescore(searcher, first, A.TermQuery("zzznosuchterm"), top_n=10)
        assert got.hits == sorted(first.hits, key=lambda t: (-t[1], t[0]))

    def test_empty_first_pass(self, searcher):
        from lucene_spark.search.postprocess import rescore

        first = searcher.search(A.TermQuery("zzznosuchterm"), k=10)
        got = rescore(searcher, first, A.TermQuery("return"), top_n=10)
        assert got.hits == [] and got.total_hits == 0


class TestRangeFacets:
    def test_counts_vs_brute(self, spark, searcher, search_index, oracle):
        q = A.TermQuery("return")
        ranges = [
            ("low", 0, 64),
            ("mid", 64, 128),
            ("all", 0, 1_000_000),  # overlapping on purpose
            ("hi_incl", 128, 199, True, True),
        ]
        got = {r["label"]: r["cnt"] for r in facet_range_counts(searcher, q, search_index.docs, "doc_id", ranges).collect()}
        hits = [d for d, _ in oracle.top_k(q, k=10**9)]
        want = {
            "low": sum(0 <= d < 64 for d in hits),
            "mid": sum(64 <= d < 128 for d in hits),
            "all": len(hits),
            "hi_incl": sum(128 <= d <= 199 for d in hits),
        }
        assert got == want

    def test_label_order_preserved(self, spark, searcher, search_index):
        q = A.TermQuery("return")
        ranges = [("b", 100, 200), ("a", 0, 100)]
        labels = [r["label"] for r in facet_range_counts(searcher, q, search_index.docs, "doc_id", ranges).collect()]
        assert labels == ["b", "a"]


class TestLongValueAndAssociationFacets:
    def test_long_value_counts_vs_brute(self, spark, searcher, search_index, oracle):
        import pyspark.sql.functions as F

        from lucene_spark.search.postprocess import long_value_facet_counts

        q = A.TermQuery("return")
        hits = [d for d, _ in oracle.top_k(q, k=10**9)]
        # LongValuesSource generality: an expression, not a raw column
        got = [
            (r["value"], r["cnt"])
            for r in long_value_facet_counts(
                searcher, q, search_index.docs, F.col("doc_id") % 7, n=5
            ).collect()
        ]
        from collections import Counter

        cnt = Counter(d % 7 for d in hits)
        want = sorted(((v, c) for v, c in cnt.items()), key=lambda t: (-t[1], t[0]))[:5]
        assert got == want
        # getAllChildrenSortByValue ordering (n=None)
        all_got = [
            (r["value"], r["cnt"])
            for r in long_value_facet_counts(
                searcher, q, search_index.docs, F.col("doc_id") % 7
            ).collect()
        ]
        assert all_got == sorted(cnt.items())

    def test_sum_associations_vs_brute(self, spark, searcher, search_index, oracle, ordered):
        from lucene_spark.search.postprocess import facet_sum_associations

        q = A.TermQuery("return")
        hits = [d for d, _ in oracle.top_k(q, k=10**9)]
        got = [
            (r["category"], r["weight"])
            for r in facet_sum_associations(
                searcher, q, search_index.docs, "repo", "doc_id"
            ).collect()
        ]
        agg: dict = {}
        for d in hits:
            agg[ordered.loc[d, "repo"]] = agg.get(ordered.loc[d, "repo"], 0) + d
        want = sorted(agg.items(), key=lambda t: (-t[1], t[0]))
        assert got == want


class TestTaxonomyFacets:
    def test_top_children_at_root(self, spark, searcher, search_index, oracle, ordered):
        q = A.TermQuery("return")
        got = [
            (r["child"], r["cnt"])
            for r in taxonomy_counts(searcher, q, search_index.docs, ["lang", "repo"]).collect()
        ]
        hits = [d for d, _ in oracle.top_k(q, k=10**9)]
        cnt: dict[str, int] = {}
        for d in hits:
            cnt[ordered.loc[d, "lang"]] = cnt.get(ordered.loc[d, "lang"], 0) + 1
        want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))
        assert got == want

    def test_children_under_path(self, spark, searcher, search_index, oracle, ordered):
        q = A.TermQuery("return")
        got = [
            (r["child"], r["cnt"])
            for r in taxonomy_counts(
                searcher, q, search_index.docs, ["lang", "repo"], path=("python",)
            ).collect()
        ]
        hits = [d for d, _ in oracle.top_k(q, k=10**9)]
        cnt: dict[str, int] = {}
        for d in hits:
            if ordered.loc[d, "lang"] == "python":
                cnt[ordered.loc[d, "repo"]] = cnt.get(ordered.loc[d, "repo"], 0) + 1
        want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))
        assert got == want
        assert sum(c for _v, c in got) == sum(cnt.values())

    def test_bad_path_rejected(self, searcher, search_index):
        with pytest.raises(ValueError):
            taxonomy_counts(
                searcher, A.MatchAllDocsQuery(), search_index.docs, ["lang"], path=("python",)
            )


class TestDistributedHitRelation:
    """match_frame + mode="distributed" post-processing: the hit set
    stays a DataFrame (no driver materialization) and must agree
    exactly with the driver path."""

    def test_match_frame_equals_driver_hits(self, spark, searcher, oracle):
        q = A.TermQuery("return")
        rows = searcher.match_frame(q).collect()
        got = {r["doc_id"]: r["score"] for r in rows}
        want = dict(oracle.top_k(q, k=10**9))
        assert set(got) == set(want)
        for d in got:
            assert math.isclose(got[d], float(want[d]), rel_tol=1e-6)

    def test_count_distributed_equals_driver(self, spark, searcher):
        q = A.BooleanQuery(
            ((A.Occur.MUST, A.TermQuery("return")), (A.Occur.MUST, A.TermQuery("if")))
        )
        assert searcher.count(q, mode="distributed") == searcher.count(q)

    def test_facets_distributed_equals_driver(self, spark, searcher, search_index):
        q = A.TermQuery("return")
        a = facet_range_counts(
            searcher, q, search_index.docs, "doc_id", [("lo", 0, 100), ("hi", 100, 200)]
        ).collect()
        b = facet_range_counts(
            searcher, q, search_index.docs, "doc_id", [("lo", 0, 100), ("hi", 100, 200)],
            mode="distributed",
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_taxonomy_distributed_equals_driver(self, spark, searcher, search_index):
        q = A.TermQuery("merge")
        a = taxonomy_counts(searcher, q, search_index.docs, ["lang", "repo"]).collect()
        b = taxonomy_counts(
            searcher, q, search_index.docs, ["lang", "repo"], mode="distributed"
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_group_top_distributed_equals_driver(self, spark, searcher, search_index):
        from lucene_spark.search.postprocess import group_top_hits

        q = A.TermQuery("return")
        a = group_top_hits(searcher, q, search_index.docs, "lang", 2).orderBy("lang", "grank").collect()
        b = (
            group_top_hits(searcher, q, search_index.docs, "lang", 2, mode="distributed")
            .orderBy("lang", "grank")
            .collect()
        )
        assert [(r["lang"], r["grank"], r["doc_id"], round(r["score"], 5)) for r in a] == [
            (r["lang"], r["grank"], r["doc_id"], round(r["score"], 5)) for r in b
        ]

    def test_function_score_distributed_equals_driver(self, spark, searcher, search_index):
        q = A.TermQuery("return")
        a = function_score(searcher, q, "_score * (1 + doc_id % 7)", search_index.docs, k=10).collect()
        b = function_score(
            searcher, q, "_score * (1 + doc_id % 7)", search_index.docs, k=10, mode="distributed"
        ).collect()
        assert [(r["rank"], r["doc_id"]) for r in a] == [(r["rank"], r["doc_id"]) for r in b]
        for ra, rb in zip(a, b):
            assert math.isclose(ra["score"], rb["score"], rel_tol=1e-6)


class TestDrillDown:
    def test_filters_do_not_score(self, spark, searcher, oracle, ordered):
        base = A.TermQuery("return")
        q = drill_down(base, {"lang": ("python", "go")})
        td = searcher.search(q, k=10**9)
        base_scores = dict(oracle.top_k(base, k=10**9))
        langs = {i: ordered.loc[i, "lang"] for i in range(len(ordered))}
        want = {d: s for d, s in base_scores.items() if langs[d] in ("python", "go")}
        got = {d: s for d, s in td.hits}
        assert set(got) == set(want)
        for d in got:
            assert np.isclose(got[d], want[d], rtol=1e-6)

    def test_multi_dim_and_semantics(self, spark, searcher, ordered, oracle):
        base = A.TermQuery("return")
        q = drill_down(base, {"lang": "python", "repo": "org0/repo0"})
        td = searcher.search(q, k=10**9)
        for d, _s in td.hits:
            assert ordered.loc[d, "lang"] == "python"
            assert ordered.loc[d, "repo"] == "org0/repo0"

    def test_no_base_query_is_matchall_filter(self, spark, searcher, ordered):
        q = drill_down(None, {"lang": "go"})
        td = searcher.search(q, k=10**9)
        want = {i for i in range(len(ordered)) if ordered.loc[i, "lang"] == "go"}
        assert {d for d, _ in td.hits} == want
