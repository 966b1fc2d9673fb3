"""LongRange/DoubleRange field queries — the 4 RangeFieldQuery
relations vs python brute force.

Reference: lucene/core/src/java/org/apache/lucene/document/
RangeFieldQuery.java:65-347 (INTERSECTS/WITHIN/CONTAINS/CROSSES);
LongRange.newIntersectsQuery etc.
"""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A


def _range_of(doc_id: int) -> tuple[int, int]:
    lo = (doc_id * 17) % 50
    return lo, lo + (doc_id * 7) % 13


@pytest.fixture(scope="module")
def searcher(spark, corpus_pdf, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search.engine import Searcher

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    pdf["r_lo"] = [_range_of(i)[0] for i in range(len(pdf))]
    pdf["r_hi"] = [_range_of(i)[1] for i in range(len(pdf))]
    d = str(tmp_path_factory.mktemp("rngf"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4)).build(
        spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False
    )
    yield Searcher(SearchIndex(spark, d))
    shutil.rmtree(d, ignore_errors=True)


def _brute(n: int, lo: int, hi: int, relation: str) -> set[int]:
    out = set()
    for i in range(n):
        a, b = _range_of(i)
        inter = a <= hi and b >= lo
        within = a >= lo and b <= hi
        if relation == "intersects":
            keep = inter
        elif relation == "within":
            keep = within
        elif relation == "contains":
            keep = a <= lo and b >= hi
        else:  # crosses = intersects && !within (RangeFieldQuery:328-345)
            keep = inter and not within
        if keep:
            out.add(i)
    return out


N = 200
QUERY = (10, 25)


class TestRangeField:
    @pytest.mark.parametrize("relation", ["intersects", "within", "contains", "crosses"])
    def test_relations_vs_brute(self, searcher, relation):
        # contains needs a query narrower than the doc ranges (max
        # width 12) to be non-trivial
        lo, hi = (20, 22) if relation == "contains" else QUERY
        q = A.RangeFieldQuery("r_lo", "r_hi", lo, hi, relation=relation)
        got = {d for d, _ in searcher.search(q, k=10**6).hits}
        want = _brute(N, lo, hi, relation)
        assert got == want and want, relation
        # distributed twin
        gotd = {d for d, _ in searcher.search(q, k=10**6, mode="distributed").hits}
        assert gotd == want, relation

    def test_crosses_is_intersects_minus_within(self, searcher):
        inter = {d for d, _ in searcher.search(
            A.RangeFieldQuery("r_lo", "r_hi", *QUERY, relation="intersects"), k=10**6).hits}
        within = {d for d, _ in searcher.search(
            A.RangeFieldQuery("r_lo", "r_hi", *QUERY, relation="within"), k=10**6).hits}
        crosses = {d for d, _ in searcher.search(
            A.RangeFieldQuery("r_lo", "r_hi", *QUERY, relation="crosses"), k=10**6).hits}
        assert crosses == inter - within

    def test_composes_as_filter(self, searcher):
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.RangeFieldQuery("r_lo", "r_hi", *QUERY, relation="within")),
            )
        )
        got = {d for d, _ in searcher.search(q, k=10**6).hits}
        base = {d for d, _ in searcher.search(A.TermQuery("return"), k=10**6).hits}
        assert got == base & _brute(N, *QUERY, "within")
        # scores unchanged by the FILTER clause
        s_base = dict(searcher.search(A.TermQuery("return"), k=10**6).hits)
        for d, s in searcher.search(q, k=10**6).hits:
            assert s == s_base[d]

    def test_unknown_relation_rejected(self, searcher):
        with pytest.raises(ValueError):
            searcher.search(A.RangeFieldQuery("r_lo", "r_hi", 1, 2, relation="nope"), k=5)


class TestMultiRange:
    """sandbox MultiRangeQuery.java:45-55 — OR of point ranges over one
    field in a single pass; rewrite merges overlapping 1-D ranges
    (:172-188, mergeOverlappingRanges :197-230)."""

    def test_vs_brute(self, searcher):
        q = A.MultiRangeQuery("r_lo", ((0, 5), (20, 30), (45, None)))
        got = {d for d, _ in searcher.search(q, k=10**6).hits}
        want = {
            i
            for i in range(N)
            if (0 <= _range_of(i)[0] <= 5)
            or (20 <= _range_of(i)[0] <= 30)
            or (_range_of(i)[0] >= 45)
        }
        assert got == want and want
        gotd = {d for d, _ in searcher.search(q, k=10**6, mode="distributed").hits}
        assert gotd == want

    def test_merge_rewrite(self):
        from lucene_spark.search.ast import _merge_ranges

        # overlap merges, disjoint stays, containment collapses
        assert _merge_ranges(((0, 5), (3, 9), (12, 14))) == ((0, 9), (12, 14))
        assert _merge_ranges(((3, 9), (4, 6))) == ((3, 9),)
        assert _merge_ranges(((None, 5), (2, 8), (20, None))) == ((None, 8), (20, None))
        # adjacency (upper < next lower) does NOT merge
        assert _merge_ranges(((0, 5), (6, 9))) == ((0, 5), (6, 9))

    def test_single_range_unwraps(self):
        q = A.rewrite(A.MultiRangeQuery("r_lo", ((0, 5), (2, 9))))
        assert q == A.FieldRangeQuery("r_lo", 0, 9, True, True)

    def test_empty_matches_nothing(self, searcher):
        assert searcher.search(A.MultiRangeQuery("r_lo", ()), k=5).hits == []

    def test_equivalent_to_or_of_ranges(self, searcher):
        multi = A.MultiRangeQuery("r_lo", ((0, 5), (20, 30)))
        ors = A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.FieldRangeQuery("r_lo", 0, 5)),
                (A.Occur.SHOULD, A.FieldRangeQuery("r_lo", 20, 30)),
            )
        )
        a = {d for d, _ in searcher.search(multi, k=10**6).hits}
        b = {d for d, _ in searcher.search(ors, k=10**6).hits}
        assert a == b
