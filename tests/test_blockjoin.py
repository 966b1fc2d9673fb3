"""Block joins (lucene/join ToParentBlockJoinQuery /
ToChildBlockJoinQuery / ParentChildrenBlockJoinQuery) vs brute-force
re-derivations over the oracle index.

The fixture corpus has dense doc ids 0..199; a parent flag like
``doc_id % 5 = 4`` imposes the reference's block layout (children
first, parent last) without rebuilding the index."""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.blockjoin import (
    parent_children,
    parent_map,
    to_child_block_join,
    to_parent_block_join,
)
from lucene_spark.search.engine import Searcher

N_DOCS = 200


def _brute_parent(doc_id: int, mod: int, n: int = N_DOCS):
    p = doc_id + (mod - 1 - doc_id % mod)
    return p if (p < n and p != doc_id) else None


class TestParentMap:
    @pytest.mark.parametrize("mod,bucket", [(5, 4096), (5, 8), (7, 8), (37, 8), (37, 16)])
    def test_vs_brute(self, search_index, mod, bucket):
        # mod=7: docs 196..199 are orphans (dropped); mod=37 with
        # bucket=8: most buckets hold no parent (fallback path).
        got = {
            r["doc_id"]: r["parent_id"]
            for r in parent_map(search_index.docs, f"doc_id % {mod} = {mod - 1}", bucket).collect()
        }
        want = {}
        for d in range(N_DOCS):
            if d % mod == mod - 1:
                continue
            p = _brute_parent(d, mod)
            if p is not None:
                want[d] = p
        assert got == want


class TestToParentBlockJoin:
    @pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
    def test_vs_brute(self, search_index, oracle, mode):
        s = Searcher(search_index)
        got = [
            (r["rank"], r["parent_doc_id"], r["n_children"], r["score"])
            for r in to_parent_block_join(s, A.TermQuery("return"), "doc_id % 5 = 4", mode, k=10).collect()
        ]
        groups: dict[int, list[float]] = {}
        for d, sc in oracle.top_k(A.TermQuery("return"), k=10**9):
            if d % 5 == 4:  # parent matches excluded by contract
                continue
            groups.setdefault(_brute_parent(d, 5), []).append(sc)
        agg = {"max": max, "total": sum, "avg": lambda v: sum(v) / len(v), "min": min}[mode]
        want_rows = sorted(((agg(v), p, len(v)) for p, v in groups.items()), key=lambda t: (-t[0], t[1]))[:10]
        want = [(i + 1, p, n, sc) for i, (sc, p, n) in enumerate(want_rows)]
        assert [(r, p, n) for r, p, n, _ in got] == [(r, p, n) for r, p, n, _ in want]
        for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
            assert abs(gs - ws) < 5e-3

    def test_score_mode_none(self, search_index):
        s = Searcher(search_index)
        rows = to_parent_block_join(s, A.TermQuery("return"), "doc_id % 5 = 4", "none", k=10).collect()
        assert rows and all(r["score"] == 1.0 for r in rows)

    def test_bad_mode_raises(self, search_index):
        with pytest.raises(ValueError):
            to_parent_block_join(Searcher(search_index), A.TermQuery("return"), "doc_id % 5 = 4", "sum")


class TestToChildBlockJoin:
    def test_children_inherit_parent_score(self, search_index, oracle):
        s = Searcher(search_index)
        got = [
            (r["rank"], r["doc_id"], r["parent_doc_id"], r["score"])
            for r in to_child_block_join(s, A.TermQuery("return"), "doc_id % 5 = 4", k=15).collect()
        ]
        phits = {d: sc for d, sc in oracle.top_k(A.TermQuery("return"), k=10**9) if d % 5 == 4}
        kids = []
        for d in range(N_DOCS):
            if d % 5 == 4:
                continue
            p = _brute_parent(d, 5)
            if p in phits:
                kids.append((phits[p], d, p))
        want_rows = sorted(kids, key=lambda t: (-t[0], t[1]))[:15]
        want = [(i + 1, d, p, sc) for i, (sc, d, p) in enumerate(want_rows)]
        assert [(r, d, p) for r, d, p, _ in got] == [(r, d, p) for r, d, p, _ in want]
        for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
            assert abs(gs - ws) < 5e-3


class TestParentChildren:
    def test_expand_one_parent(self, search_index, oracle):
        s = Searcher(search_index)
        all_hits = dict(oracle.top_k(A.TermQuery("return"), k=10**9))
        # pick the first parent with >=1 matching real child
        target = next(
            p
            for p in range(4, N_DOCS, 5)
            if any(d in all_hits for d in range(p - 4, p))
        )
        got = [(r["doc_id"], r["score"]) for r in parent_children(s, A.TermQuery("return"), target, "doc_id % 5 = 4").collect()]
        want = sorted(
            ((d, all_hits[d]) for d in range(target - 4, target) if d in all_hits),
            key=lambda t: (-t[1], t[0]),
        )
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 5e-3

    def test_first_block(self, search_index, oracle):
        # parent 4 has no previous parent (prevSetBit == -1 branch)
        s = Searcher(search_index)
        all_hits = dict(oracle.top_k(A.TermQuery("return"), k=10**9))
        got = [r["doc_id"] for r in parent_children(s, A.TermQuery("return"), 4, "doc_id % 5 = 4").collect()]
        want = [d for _, d in sorted((-all_hits[d], d) for d in range(0, 4) if d in all_hits)]
        assert got == want
