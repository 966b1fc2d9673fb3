"""Facets, highlighting, and the per-reader term-row LRU cache."""

from __future__ import annotations

import time

import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.postprocess import _make_snippet, facet_counts, highlight


class TestFacets:
    def test_facet_counts_vs_brute(self, spark, search_index, corpus_pdf):
        s = Searcher(search_index)
        docs_df = search_index.docs.select("doc_id", "lang")
        got = {r["lang"]: r["cnt"] for r in facet_counts(s, A.TermQuery("return"), docs_df, "lang").collect()}
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        want: dict[str, int] = {}
        for i in range(len(ordered)):
            if "return" in tokenize(ordered.loc[i, "content"]):
                want[ordered.loc[i, "lang"]] = want.get(ordered.loc[i, "lang"], 0) + 1
        assert got == want


class TestHighlight:
    def test_snippet_marks_terms(self):
        s = _make_snippet("the quick Brown fox jumps over the lazy dog", {"brown", "lazy"}, window=1)
        assert "<b>Brown</b>" in s and "<b>lazy</b>" in s
        assert "quick" in s and "jumps" not in s.replace("<b>", "")  # windowed

    def test_highlight_df(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "nothing here")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r["snippet"] for r in highlight(df, ["beta"]).collect()}
        assert "<b>beta</b>" in rows[0]
        assert rows[1] == ""


class TestQueryCache:
    def test_repeat_query_uses_cache(self, spark, search_index):
        s = Searcher(search_index)
        a = s.search("return AND if", k=10).hits
        assert "return" in search_index._row_cache and "if" in search_index._row_cache
        t0 = time.time()
        b = s.search("return AND if", k=10).hits
        warm = time.time() - t0
        assert a == b
        assert warm < 0.15  # no Spark job on the warm path

    def test_negative_cache(self, spark, search_index):
        s = Searcher(search_index)
        assert s.search("zzzznosuchterm", k=10).hits == []
        assert search_index._row_cache.get("zzzznosuchterm") == []
        assert s.search("zzzznosuchterm", k=10).hits == []
