"""CombinedFieldQuery (BM25F) vs a from-definitions brute force."""

from __future__ import annotations

import math
import shutil
from collections import Counter

import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE, int_to_byte4
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search.combined import combined_field_search
from lucene_spark.search.engine import Searcher

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def cf_index(tmp_path_factory, spark, corpus_df):
    d = str(tmp_path_factory.mktemp("cf_index"))
    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, extra_fields=("path",), positions=True)
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256"), d)
    yield SearchIndex(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def brute_bm25f(corpus_pdf, terms, weights):
    """weights = {'content': w1, 'path': w2}; returns [(doc, score)]."""
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    n = len(ordered)
    toks = {f: [tokenize(ordered.loc[i, f]) for i in range(n)] for f in weights}
    # per-field norm bytes (docs with zero tokens of a field have none)
    nb = {
        f: [int_to_byte4(len(t)) if t else None for t in toks[f]]
        for f in weights
    }
    # pseudo stats
    doc_freq = 0
    for f in weights:
        for t in terms:
            df = sum(1 for ts in toks[f] if t in ts)
            doc_freq = max(doc_freq, df)
    doc_count = max(sum(1 for ts in toks[f] if ts) for f in weights)
    sum_ttf = sum(weights[f] * sum(len(ts) for ts in toks[f]) for f in weights)
    avgdl = sum_ttf / doc_count
    idf = math.log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    out = []
    for d in range(n):
        freq = sum(
            weights[f] * Counter(toks[f][d])[t] for f in weights for t in terms
        )
        if freq <= 0:
            continue
        nv = sum(
            weights[f] * NORM_LENGTH_TABLE[nb[f][d]]
            for f in weights
            if nb[f][d] is not None
        )
        dlen = NORM_LENGTH_TABLE[int_to_byte4(round(nv))]
        s = idf - idf / (1 + freq * (1.0 / (K1 * ((1 - B) + B * dlen / avgdl))))
        out.append((d, s))
    return sorted(out, key=lambda t: (-t[1], t[0]))


class TestCombinedField:
    @pytest.mark.parametrize(
        "terms,weights",
        [
            (["return"], {"content": 1.0, "path": 1.0}),
            (["py"], {"content": 1.0, "path": 2.0}),
            (["return", "if"], {"content": 1.0, "path": 0.5}),
        ],
        ids=["both-fields", "path-heavy", "two-terms"],
    )
    def test_vs_brute(self, cf_index, corpus_pdf, terms, weights):
        s = Searcher(cf_index)
        got = combined_field_search(s, terms, weights, k=10)
        want = brute_bm25f(corpus_pdf, terms, weights)[:10]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 5e-3 * max(1.0, abs(b))

    def test_absent_term_empty(self, cf_index):
        s = Searcher(cf_index)
        assert combined_field_search(s, ["zzznotaterm"], {"content": 1.0, "path": 1.0}) == []

    def test_unknown_field_raises(self, cf_index):
        with pytest.raises(ValueError):
            combined_field_search(Searcher(cf_index), ["return"], {"lang": 1.0})

    def test_single_field_reduces_to_bm25(self, cf_index, corpus_pdf):
        # {content: 1.0} must equal ordinary TermQuery BM25 ranking
        from lucene_spark.search import ast as A

        s = Searcher(cf_index)
        got = combined_field_search(s, ["return"], {"content": 1.0}, k=10)
        want = s.search(A.TermQuery("return"), k=10).hits
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-5
