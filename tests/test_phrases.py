"""Positions index + exact PhraseQuery (ExactPhraseMatcher semantics),
including the dropped->255-char-token position-gap rule."""

import numpy as np
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.codec.positions import pack_positions, unpack_positions
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.parser import parse_query


class TestPositionCodec:
    def test_round_trip(self):
        rng = np.random.default_rng(7)
        pos_lists = []
        tfs = []
        for _ in range(50):
            n = int(rng.integers(1, 30))
            pos_lists.append(np.sort(rng.choice(10000, size=n, replace=False)))
            tfs.append(n)
        blob = pack_positions(pos_lists)
        back = unpack_positions(blob, np.array(tfs))
        for a, b in zip(pos_lists, back):
            assert (a == b).all()

    def test_empty(self):
        assert pack_positions([]) == b""
        assert unpack_positions(b"", np.array([], dtype=np.int64)) == []


@pytest.fixture(scope="module")
def searcher(search_index):
    return Searcher(search_index, total_hits_threshold=10)


def _phrases_from_corpus(corpus_pdf, n=8):
    """Real adjacent token pairs/triples occurring in fixture docs."""
    out = []
    for content in corpus_pdf["content"].head(40):
        toks = tokenize(content)
        if len(toks) >= 3:
            out.append(tuple(toks[0:2]))
            out.append(tuple(toks[1:4]))
        if len(out) >= n:
            break
    return list(dict.fromkeys(out))[:n]


class TestPhraseRankIdentity:
    def test_real_phrases(self, searcher, oracle, corpus_pdf):
        for terms in _phrases_from_corpus(corpus_pdf):
            q = A.PhraseQuery(terms)
            got = searcher.search(q, k=20).hits
            want = oracle.top_k(q, 20)
            _assert_identical(got, want, terms)

    def test_parsed_phrase(self, searcher, oracle, corpus_pdf):
        terms = _phrases_from_corpus(corpus_pdf, 1)[0]
        q = parse_query('"' + " ".join(terms) + '"')
        _assert_identical(searcher.search(q, k=15).hits, oracle.top_k(q, 15), terms)

    def test_phrase_in_boolean(self, searcher, oracle, corpus_pdf):
        terms = _phrases_from_corpus(corpus_pdf, 1)[0]
        q = A.BooleanQuery(
            ((A.Occur.SHOULD, A.PhraseQuery(terms)), (A.Occur.SHOULD, A.TermQuery("return")))
        )
        _assert_identical(searcher.search(q, k=25).hits, oracle.top_k(q, 25), terms)

    def test_nonexistent_phrase(self, searcher, oracle):
        q = A.PhraseQuery(("return", "zzznotaword"))
        assert searcher.search(q, k=10).hits == []

    def test_adjacent_but_reversed_no_match_guarantee(self, searcher, oracle, corpus_pdf):
        terms = _phrases_from_corpus(corpus_pdf, 1)[0]
        rq = A.PhraseQuery(tuple(reversed(terms)))
        _assert_identical(searcher.search(rq, k=20).hits, oracle.top_k(rq, 20), terms)

    def test_distributed_phrase(self, searcher, oracle, corpus_pdf):
        terms = _phrases_from_corpus(corpus_pdf, 1)[0]
        q = A.PhraseQuery(terms)
        got = searcher.search(q, k=20, mode="distributed").hits
        _assert_identical(got, oracle.top_k(q, 20), ("dist",) + terms)

    def test_sloppy_returns_superset(self, searcher):
        """Sloppy matching is implemented (tests/test_sloppy.py has the
        brute-force comparison); here: slop widens the doc set."""
        exact = {d for d, _ in searcher.search(A.PhraseQuery(("return", "if")), k=10_000).hits}
        sloppy = {d for d, _ in searcher.search(A.PhraseQuery(("return", "if"), slop=2), k=10_000).hits}
        assert exact <= sloppy


class TestPositionsInvariants:
    def test_positions_match_ground_truth(self, search_index, corpus_pdf):
        """Every stored position list equals the independent
        tokenize_with_positions run (incl. dropped-token gaps)."""
        from lucene_spark.analysis import tokenize_with_positions
        from lucene_spark.codec.forutil import unpack_postings
        from lucene_spark.codec.positions import unpack_positions as up

        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        truth = {}
        for doc_id, content in enumerate(ordered["content"]):
            toks, poss = tokenize_with_positions(content)
            for t, p in zip(toks, poss):
                truth.setdefault(t, {}).setdefault(doc_id, []).append(p)
        rows = search_index.postings.collect()
        checked = 0
        for r in rows:
            d, tf, _ = unpack_postings(bytes(r["blob"]))
            plists = up(bytes(r["pos_blob"]), tf)
            for doc, tfv, pl in zip(d, tf, plists):
                assert len(pl) == tfv
                assert list(pl) == truth[r["term"]][int(doc)]
                checked += 1
        assert checked > 1000

    def test_gap_from_dropped_token(self, search_index, corpus_pdf):
        """Docs containing the 256-char special must show a position
        gap where it was dropped."""
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        from lucene_spark.analysis import tokenize_with_positions

        found_gap = False
        for content in ordered["content"]:
            toks, poss = tokenize_with_positions(content)
            if poss and poss[-1] != len(toks) - 1:
                found_gap = True
                break
        assert found_gap, "fixture should contain dropped over-length tokens"


def _identical(got, want):
    return len(got) == len(want) and all(
        gd == wd and np.float32(gs) == np.float32(ws) for (gd, gs), (wd, ws) in zip(got, want)
    )


def _assert_identical(got, want, msg):
    assert len(got) == len(want), f"{msg}: {len(got)} vs {len(want)}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{msg} rank {i}: doc {gd} != {wd}"
        assert np.float32(gs) == np.float32(ws), f"{msg} rank {i}: score {gs} != {ws}"
