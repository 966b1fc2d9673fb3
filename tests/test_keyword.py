"""KeywordAnalyzer: the whole field value is ONE case-preserved token
(KeywordAnalyzer.java:26-36 / KeywordTokenizer.java:28-40), no length
cap, no filters.

Oracle: a keyword index over a low-cardinality value column must agree
with plain column-equality filters (StringField semantics) for term
queries, with LIKE for prefix/wildcard through the same term
dictionary, and with hand-computed BM25 (tf=1, dl=1) for scores.
"""

from __future__ import annotations

import math
import shutil

import pytest

from lucene_spark.analysis.tokenizer import tokenize, tokenize_pos_off_series
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


def test_tokenizer_semantics():
    assert tokenize("New York City", stem="keyword") == ["New York City"]
    assert tokenize("", stem="keyword") == []
    assert tokenize("a-b/C.D e", stem="keyword") == ["a-b/C.D e"]
    # no 255-char drop (KeywordTokenizer grows its buffer; nothing dropped)
    long = "x" * 5000
    assert tokenize(long, stem="keyword") == [long]


def test_offsets_cover_whole_input():
    import pandas as pd

    toks, poss, sts, ens = tokenize_pos_off_series(
        pd.Series(["Hello World", ""]), stem="keyword"
    )
    assert list(toks.iloc[0]) == ["Hello World"]
    assert list(poss.iloc[0]) == [0]
    assert (sts.iloc[0][0], ens.iloc[0][0]) == (0, 11)
    assert list(toks.iloc[1]) == []


@pytest.fixture(scope="module")
def kw_index(tmp_path_factory, spark, corpus_pdf):
    """Keyword index whose content is a synthetic multi-word cased
    value derived from the row: 'Cat <k>' with k = doc order % 7."""
    pdf = corpus_pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    pdf["kwval"] = ["Cat %d" % (i % 7) for i in range(len(pdf))]
    pdf2 = pdf.drop(columns=["content", "content_sha256"]).rename(
        columns={"kwval": "content"}
    )
    d = str(tmp_path_factory.mktemp("kwix"))
    IndexBuilder(
        spark, IndexConfig(analyzer="keyword", docs_per_chunk=128, term_buckets=4)
    ).build(spark.createDataFrame(pdf2), d, assign_ids=False)
    ix = SearchIndex(spark, d)
    yield ix, pdf2
    shutil.rmtree(d, ignore_errors=True)


def test_term_equals_column_equality(spark, kw_index):
    ix, pdf = kw_index
    s = Searcher(ix)
    td = s.search(A.TermQuery("Cat 3"), k=10**6)
    want = sorted(i for i, v in enumerate(pdf["content"]) if v == "Cat 3")
    assert sorted(d for d, _ in td.hits) == want
    # the value is ONE token: its words are not individually searchable,
    # and case folding never happened
    assert s.search(A.TermQuery("Cat"), k=10).hits == []
    assert s.search(A.TermQuery("cat 3"), k=10).hits == []


def test_prefix_wildcard_through_term_dictionary(spark, kw_index):
    ix, pdf = kw_index
    s = Searcher(ix)
    got = sorted(d for d, _ in s.search(A.PrefixQuery("Cat "), k=10**6).hits)
    assert got == list(range(len(pdf)))
    got = sorted(d for d, _ in s.search(A.WildcardQuery("*3"), k=10**6).hits)
    want = sorted(i for i, v in enumerate(pdf["content"]) if v.endswith("3"))
    assert got == want


def test_bm25_with_unit_norms(spark, kw_index):
    """Every doc is one token: tf=1, dl=1, avgdl=1 — the BM25 score is
    idf * (1 - 1/(1 + 1/k1)) exactly, identical for every match."""
    ix, pdf = kw_index
    s = Searcher(ix)
    td = s.search(A.TermQuery("Cat 3"), k=5)
    n = len(pdf)
    df = sum(1 for v in pdf["content"] if v == "Cat 3")
    w = math.log(1 + (n - df + 0.5) / (df + 0.5))
    want = w - w / (1 + 1.0 * (1.0 / (1.2 * ((1 - 0.75) + 0.75 * 1.0))))
    for _, sc in td.hits:
        assert abs(sc - want) < 1e-5


def test_string_query_parsing(spark, kw_index):
    """string queries against a keyword index go through the parser
    with the keyword analyzer: each clause's text is ONE case-preserved
    term (QueryParser + KeywordAnalyzer behavior)."""
    from lucene_spark.search.engine import Searcher

    ix, pdf = kw_index
    s = Searcher(ix)
    td = s.search('"Cat 3"', k=10**6)
    want = sorted(i for i, v in enumerate(pdf["content"]) if v == "Cat 3")
    assert sorted(d for d, _ in td.hits) == want
    assert s.count('"Cat 3"') == len(want)
    # lowercased or split forms do NOT match (no folding, no splitting)
    assert s.search('"cat 3"', k=5).hits == []
