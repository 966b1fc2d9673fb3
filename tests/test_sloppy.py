"""Sloppy phrase matching (slop > 0) vs a pure-python brute force with
the same displacement semantics, plus structural invariants."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.similarity import BM25Stats, idf, norm_inverse_cache, score_freqs
from lucene_spark.codec.smallfloat import int_to_byte4_np


def _brute_sloppy(corpus_texts: dict[int, str], terms: tuple[str, ...], slop: int, k: int):
    """Independent implementation: tokenize per doc, enumerate matches
    from first-term occurrences, nearest-position alignment, BM25."""
    toks = {d: tokenize(t) for d, t in corpus_texts.items()}
    n_docs = len(toks)
    sum_ttf = sum(len(v) for v in toks.values())
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    if any(dfs[t] == 0 for t in terms):
        return []
    stats = BM25Stats(n_docs, sum_ttf)
    weight = np.float32(np.sum([float(idf(dfs[t], n_docs)) for t in terms]))
    cache = stats.cache()
    hits = []
    for d, v in toks.items():
        pos = {t: [i for i, x in enumerate(v) if x == t] for t in terms}
        if any(not pos[t] for t in terms):
            continue
        freq = 0.0
        for p in pos[terms[0]]:
            disp = 0
            ok = True
            for i, t in enumerate(terms[1:], 1):
                cands = pos[t]
                best = min(abs(q - (p + i)) for q in cands)
                disp += best
                if disp > slop:
                    ok = False
                    break
            if ok:
                freq += 1.0 / (1 + disp)
        if freq > 0:
            nb = int(int_to_byte4_np(np.array([len(v)]))[0])
            s = float(score_freqs(weight, np.array([freq]), np.array([nb]), cache)[0])
            hits.append((d, s))
    hits.sort(key=lambda h: (-h[1], h[0]))
    return hits[:k]


@pytest.fixture(scope="module")
def corpus_texts(corpus_pdf):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return {i: ordered.loc[i, "content"] for i in range(len(ordered))}


class TestSloppyPhrases:
    @pytest.mark.parametrize("terms,slop", [
        (("return", "if"), 1),
        (("return", "if"), 3),
        (("int", "return"), 2),
        (("return", "if", "int"), 4),
    ])
    def test_vs_brute_force(self, spark, search_index, corpus_texts, terms, slop):
        s = Searcher(search_index)
        got = s.search(A.PhraseQuery(terms, slop=slop), k=10).hits
        want = _brute_sloppy(corpus_texts, terms, slop, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-6)

    def test_slop_zero_equals_exact(self, spark, search_index):
        s = Searcher(search_index)
        exact = s.search(A.PhraseQuery(("return", "if")), k=20).hits
        sloppy0 = s.search(A.PhraseQuery(("return", "if"), slop=0), k=20).hits
        assert exact == sloppy0

    def test_slop_widens_matches(self, spark, search_index):
        s = Searcher(search_index)
        n0 = s.count(A.PhraseQuery(("return", "if"), slop=0))
        n2 = s.count(A.PhraseQuery(("return", "if"), slop=2))
        n5 = s.count(A.PhraseQuery(("return", "if"), slop=5))
        assert n0 <= n2 <= n5
        assert n5 > n0  # fixtures guarantee near-adjacent pairs exist

    def test_parser_slop_syntax(self, spark, search_index):
        s = Searcher(search_index)
        a = s.search('"return if"~2', k=10).hits
        b = s.search(A.PhraseQuery(("return", "if"), slop=2), k=10).hits
        assert a == b


class TestMultiPhrase:
    def test_multiphrase_vs_brute(self, spark, search_index, corpus_texts):
        from lucene_spark.search.similarity import BM25Stats

        slots = (("return", "int"), ("if",))
        s = Searcher(search_index)
        got = s.search(A.MultiPhraseQuery(slots), k=10).hits

        toks = {d: tokenize(t) for d, t in corpus_texts.items()}
        n_docs = len(toks)
        sum_ttf = sum(len(v) for v in toks.values())
        uniq = sorted({t for slot in slots for t in slot})
        dfs = {t: sum(1 for v in toks.values() if t in v) for t in uniq}
        stats = BM25Stats(n_docs, sum_ttf)
        weight = np.float32(np.sum([float(idf(dfs[t], n_docs)) for t in uniq]))
        cache = stats.cache()
        hits = []
        for d, v in toks.items():
            slot_pos = [sorted({i for i, x in enumerate(v) if x in slot}) for slot in slots]
            if any(not p for p in slot_pos):
                continue
            freq = sum(1 for p in slot_pos[0] if all((p + i) in set(slot_pos[i]) for i in range(1, len(slots))))
            if freq:
                nb = int(int_to_byte4_np(np.array([len(v)]))[0])
                sc = float(score_freqs(weight, np.array([freq]), np.array([nb]), cache)[0])
                hits.append((d, sc))
        hits.sort(key=lambda h: (-h[1], h[0]))
        want = hits[:10]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-6)

    def test_rewrites(self, spark):
        # single-term slots collapse to PhraseQuery; single slot → Synonym
        q = A.rewrite(A.MultiPhraseQuery((("a",), ("b",))))
        assert q == A.PhraseQuery(("a", "b"))
        q = A.rewrite(A.MultiPhraseQuery((("a", "b"),)))
        assert q == A.SynonymQuery(("a", "b"))
        q = A.rewrite(A.MultiPhraseQuery((("a",), ())))
        assert isinstance(q, A.MatchNoDocsQuery)
