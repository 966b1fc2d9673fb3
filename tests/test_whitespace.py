"""WhitespaceAnalyzer: whitespace tokenizer, case preserved, no filters
(WhitespaceAnalyzer.java:30-38 / WhitespaceTokenizer.java:28-35).

Oracle: a whitespace index over case-transformed text must equal a
standard index over the SAME token stream pre-normalized — and cased
query terms must match exactly (no lowercase folding anywhere).
"""

from __future__ import annotations

import shutil

import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search.engine import Searcher


def test_tokenizer_semantics():
    assert tokenize("Foo-Bar  BAZ\tqux's", stem="whitespace") == ["Foo-Bar", "BAZ", "qux's"]
    assert tokenize("", stem="whitespace") == []
    long = "x" * 256
    assert tokenize(f"a {long} b", stem="whitespace") == ["a", "b"]  # 255 drop rule


@pytest.fixture(scope="module")
def ws_index(tmp_path_factory, spark, corpus_pdf):
    """Whitespace index over initcap-ed fixture text: every token is
    Capitalized, so case sensitivity is observable."""
    pdf = corpus_pdf.copy()
    pdf["content"] = pdf["content"].map(
        lambda t: " ".join(w.capitalize() for w in t.split())
    )
    d = str(tmp_path_factory.mktemp("wsix"))
    IndexBuilder(
        spark, IndexConfig(analyzer="whitespace", docs_per_chunk=128, term_buckets=4, positions=True)
    ).build(spark.createDataFrame(pdf).drop("content_sha256"), d)
    yield SearchIndex(spark, d), pdf
    shutil.rmtree(d, ignore_errors=True)


def test_case_sensitive_terms(spark, ws_index, tmp_path_factory, corpus_pdf):
    ix, pdf = ws_index
    s = Searcher(ix)
    # the cased surface form matches...
    got = s.search("Return", k=10)
    assert got.total_hits > 0
    # ...the lowercase form does not (no LowerCaseFilter)
    assert s.search("return", k=10).hits == []
    # scores equal a standard index over the equivalent stream: the
    # initcap bijection renames tokens without changing tf/df/dl
    d2 = str(tmp_path_factory.mktemp("stdws"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True)).build(
        spark.createDataFrame(corpus_pdf).drop("content_sha256"), d2
    )
    want = Searcher(SearchIndex(spark, d2)).search("return", k=10)
    assert got.hits == want.hits
    shutil.rmtree(d2, ignore_errors=True)


def test_phrase_and_bool(spark, ws_index):
    ix, _ = ws_index
    s = Searcher(ix)
    td = s.search('"Return Def"', k=5)
    assert td.total_hits > 0
    both = s.search("Return AND Class", k=5)
    assert both.total_hits > 0
    assert s.search("Return AND class", k=5).hits == []  # cased MUST fails


def test_punctuation_stays_inside_tokens(spark, tmp_path, corpus_pdf):
    """'foo-bar' is ONE whitespace token — searchable verbatim."""
    pdf = corpus_pdf.iloc[:50].copy()
    pdf["content"] = pdf["content"] + " special-marker:x9"
    d = str(tmp_path / "wspunct")
    IndexBuilder(spark, IndexConfig(analyzer="whitespace", docs_per_chunk=128, term_buckets=4)).build(
        spark.createDataFrame(pdf.reset_index(drop=True)).drop("content_sha256"), d
    )
    s = Searcher(SearchIndex(spark, d))
    from lucene_spark.search import ast as A

    td = s.search(A.TermQuery("special-marker:x9"), k=100)
    assert td.total_hits == 50
    shutil.rmtree(d, ignore_errors=True)
