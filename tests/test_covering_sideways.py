"""CoveringQuery (per-doc minimum-should-match) and DrillSideways
facet counts vs brute-force re-derivations."""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.covering import covering_frame, covering_top_k
from lucene_spark.search.engine import Searcher
from lucene_spark.search.postprocess import drill_down, drill_sideways, facet_counts

TERMS = ("return", "int", "table")


def _brute_covering(oracle, mm_of):
    """doc_id -> (score_sum, n_matched) filtered by per-doc min-match."""
    per_doc: dict[int, list[float]] = {}
    for t in TERMS:
        for d, sc in oracle.top_k(A.TermQuery(t), k=10**9):
            per_doc.setdefault(d, []).append(sc)
    out = {}
    for d, scores in per_doc.items():
        if len(scores) >= max(1, mm_of(d)):
            out[d] = (sum(scores), len(scores))
    return out


class TestCovering:
    def test_frame_vs_brute(self, search_index, oracle):
        s = Searcher(search_index)
        got = {
            r["doc_id"]: (r["score"], r["n_matched"])
            for r in covering_frame(s, [A.TermQuery(t) for t in TERMS], "1 + doc_id % 3").collect()
        }
        want = _brute_covering(oracle, lambda d: 1 + d % 3)
        assert set(got) == set(want)
        for d in want:
            assert got[d][1] == want[d][1]
            assert abs(got[d][0] - want[d][0]) < 5e-3

    def test_min_match_clamped_to_one(self, search_index, oracle):
        # mm = 0 behaves as 1 (the disjunction drives the scorer)
        s = Searcher(search_index)
        got = {r["doc_id"] for r in covering_frame(s, [A.TermQuery(t) for t in TERMS], "0").collect()}
        want = set(_brute_covering(oracle, lambda d: 1))
        assert got == want

    def test_top_k_tie_break(self, search_index, oracle):
        s = Searcher(search_index)
        rows = covering_top_k(s, [A.TermQuery(t) for t in TERMS], "2", k=10).collect()
        want = sorted(
            ((sc, d, n) for d, (sc, n) in _brute_covering(oracle, lambda d: 2).items()),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        assert [(r["rank"], r["doc_id"], r["n_matched"]) for r in rows] == [
            (i + 1, d, n) for i, (_, d, n) in enumerate(want)
        ]

    def test_empty_queries_raises(self, search_index):
        with pytest.raises(ValueError):
            covering_frame(Searcher(search_index), [], "1")


class TestDrillSideways:
    @pytest.mark.parametrize("mode", ["driver", "distributed"])
    def test_vs_composed_facets(self, search_index, mode):
        # sideways counts for dim X == facet_counts over drill_down with
        # every OTHER dim applied — by definition; check the composition
        # and the cross-dim wiring
        s = Searcher(search_index)
        docs = search_index.docs
        dims = {"lang": "python", "repo": docs.select("repo").first()["repo"]}
        base = A.TermQuery("return")
        got = drill_sideways(s, base, dims, docs, mode=mode).collect()
        for d in dims:
            others = {c: v for c, v in dims.items() if c != d}
            want = {
                (r[d], r["cnt"])
                for r in facet_counts(s, drill_down(base, others), docs, d, mode).collect()
            }
            assert {(r["value"], r["cnt"]) for r in got if r["dim"] == d} == {
                (str(v), c) for v, c in want
            }

    def test_sideways_differs_from_plain_drilldown(self, search_index):
        # the whole point: a dim's sideways counts ignore ITS OWN filter
        s = Searcher(search_index)
        docs = search_index.docs
        dims = {"lang": "python"}
        got = drill_sideways(s, A.TermQuery("return"), dims, docs).collect()
        langs = {r["value"] for r in got if r["dim"] == "lang"}
        assert len(langs) > 1  # other languages still counted
