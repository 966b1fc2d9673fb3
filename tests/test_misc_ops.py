"""PhraseWildcardQuery, DiversifiedTopDocsCollector, and
DocValuesStats vs brute-force re-derivations."""

from __future__ import annotations

import re

import numpy as np
import pytest

from lucene_spark.analysis import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.misc import diversified_top_k, doc_values_stats, phrase_wildcard


def _ordered(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


class TestPhraseWildcard:
    def test_expands_to_multiphrase(self, search_index, corpus_pdf):
        q = phrase_wildcard(search_index, ["return", "i*"])
        assert isinstance(q, A.MultiPhraseQuery)
        assert q.positions[0] == ("return",)
        # slot 2 = every corpus term starting with i
        vocab = set()
        for c in corpus_pdf["content"]:
            vocab.update(tokenize(c))
        assert set(q.positions[1]) == {t for t in vocab if t.startswith("i")}

    def test_all_literal_collapses_to_phrase(self, search_index):
        q = phrase_wildcard(search_index, ["return", "if"])
        assert q == A.PhraseQuery(("return", "if"))

    def test_multi_token_literal_slot(self, search_index):
        q = phrase_wildcard(search_index, ["return if", "i*"])
        assert q.positions[0] == ("return",) and q.positions[1] == ("if",)

    def test_empty_expansion_is_match_none(self, search_index):
        assert isinstance(
            phrase_wildcard(search_index, ["return", "zzzzz*"]), A.MatchNoDocsQuery
        )

    def test_search_matches_brute(self, search_index, corpus_pdf, oracle):
        s = Searcher(search_index)
        q = phrase_wildcard(search_index, ["return", "i*"])
        assert isinstance(q, A.MultiPhraseQuery) and len(q.positions[1]) > 1
        # match set vs regex over the analyzed token streams
        ordered = _ordered(corpus_pdf)
        pat = re.compile(r"^i.*$")
        want_docs = set()
        for i in range(len(ordered)):
            toks = tokenize(ordered.loc[i, "content"])
            if any(a == "return" and pat.match(b) for a, b in zip(toks, toks[1:])):
                want_docs.add(i)
        full = {d for d, _ in s.search(q, k=10**6).hits}
        assert full == want_docs


class TestDiversified:
    @pytest.mark.parametrize("cap", [1, 2])
    def test_vs_brute(self, search_index, corpus_pdf, oracle, cap):
        s = Searcher(search_index)
        rows = diversified_top_k(s, A.TermQuery("return"), "lang", cap, k=10).collect()
        ordered = _ordered(corpus_pdf)
        lang_of = {i: ordered.loc[i, "lang"] for i in range(len(ordered))}
        per_key: dict[str, int] = {}
        kept = []
        for d, sc in sorted(oracle.top_k(A.TermQuery("return"), k=10**9), key=lambda t: (-t[1], t[0])):
            kk = lang_of[d]
            if per_key.get(kk, 0) < cap:
                per_key[kk] = per_key.get(kk, 0) + 1
                kept.append((d, kk, sc))
        want = kept[:10]
        assert [(r["rank"], r["doc_id"], r["key"]) for r in rows] == [
            (i + 1, d, kk) for i, (d, kk, _) in enumerate(want)
        ]
        for r, (_, _, sc) in zip(rows, want):
            assert abs(r["score"] - sc) < 5e-3

    def test_bad_cap_raises(self, search_index):
        with pytest.raises(ValueError):
            diversified_top_k(Searcher(search_index), A.TermQuery("return"), "lang", 0)


class TestDocValuesStats:
    def test_vs_numpy(self, search_index, oracle):
        s = Searcher(search_index)
        row = doc_values_stats(s, A.TermQuery("return"), "doc_id").first()
        docs = np.array(sorted(d for d, _ in oracle.top_k(A.TermQuery("return"), k=10**9)))
        assert row["count"] == len(docs) and row["missing"] == 0
        assert row["vmin"] == docs.min() and row["vmax"] == docs.max()
        assert row["vsum"] == docs.sum()
        assert abs(row["mean"] - docs.mean()) < 1e-9
        assert abs(row["variance"] - docs.var()) < 1e-6

    def test_missing_values_counted(self, search_index, oracle):
        s = Searcher(search_index)
        expr = "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id END"
        row = doc_values_stats(s, A.TermQuery("return"), expr).first()
        docs = [d for d, _ in oracle.top_k(A.TermQuery("return"), k=10**9)]
        n_missing = sum(1 for d in docs if d % 7 == 0)
        assert row["missing"] == n_missing
        assert row["count"] == len(docs) - n_missing
