"""The "code" analyzer: WordDelimiterGraphFilter-style identifier
splitting (WordDelimiterGraphFilter.java:63-105 with GENERATE_WORD_PARTS
| GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
STEM_ENGLISH_POSSESSIVE, no catenation/preserveOriginal → linear stream).

Oracle strategy: a code-analyzed index over identifier text must be
IDENTICAL (docs, postings, norms, scores) to a standard-analyzed index
over the same text pre-split by the same rules — plus golden part
cases from the reference javadoc and the WDGF test suite.
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from lucene_spark.analysis.tokenizer import (
    code_parts,
    code_parts_spans,
    tokenize,
    tokenize_pos_series,
)
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search.engine import Searcher

GOLDEN = {
    # WordDelimiterGraphFilter.java javadoc + TestWordDelimiterGraphFilter
    "PowerShot": ["power", "shot"],
    "XMLHttpRequest": ["xml", "http", "request"],
    "snake_case_name": ["snake", "case", "name"],
    "SD500": ["sd", "500"],
    "O'Neil's": ["o", "neil"],
    "McKinley": ["mc", "kinley"],
    "utf8str": ["utf", "8", "str"],
    "HTTP": ["http"],
    "getFooBar2": ["get", "foo", "bar", "2"],
    "j2se": ["j", "2", "se"],
    "__init__": ["init"],
    "A": ["a"],
    "42": ["42"],
}


def test_code_parts_golden():
    for tok, want in GOLDEN.items():
        assert code_parts(tok) == want, tok


def test_code_parts_offsets_point_into_token():
    for tok in GOLDEN:
        for part, s, e in code_parts_spans(tok):
            assert tok[s:e].lower() == part, (tok, part)


def test_tokenize_code_stream_and_positions():
    text = "class FooBar: def do_thing(self): return HTTPResponse2"
    assert tokenize(text, stem="code") == [
        "class", "foo", "bar", "def", "do", "thing", "self", "return",
        "http", "response", "2",
    ]
    toks, poss = tokenize_pos_series(pd.Series([text]), stem="code")
    # each part consumes one position; sequential over the stream
    assert list(poss[0]) == list(range(len(toks[0])))


def _camel(corpus_pdf):
    """Join consecutive word pairs of the fixture text into camelCase
    identifiers — code-splitting them must restore the original
    token stream."""
    out = corpus_pdf.copy()

    def join_pairs(text):
        ws = text.split()
        merged = []
        i = 0
        while i < len(ws):
            if i + 1 < len(ws):
                merged.append(ws[i] + ws[i + 1].capitalize())
                i += 2
            else:
                merged.append(ws[i])
                i += 1
        return " ".join(merged)

    out["content"] = out["content"].map(join_pairs)
    return out


@pytest.fixture(scope="module")
def code_index_pair(tmp_path_factory, spark, corpus_pdf):
    """(code index over a camelCase-joined corpus, standard index over
    the same corpus PRE-SPLIT by the code rules) — the golden cases
    anchor the splitter itself; this pair proves the whole index
    pipeline (build UDFs, positions, norms, stats, scoring) treats the
    1:N analyzer exactly like a standard analyzer over pre-split text
    (the PorterStemFilter test pattern)."""
    camel = _camel(corpus_pdf)
    presplit = camel.copy()
    presplit["content"] = presplit["content"].map(
        lambda t: " ".join(tokenize(t, stem="code"))
    )
    d1 = str(tmp_path_factory.mktemp("codeix"))
    d2 = str(tmp_path_factory.mktemp("stdix"))
    cfg = dict(docs_per_chunk=128, term_buckets=4, positions=True)
    IndexBuilder(spark, IndexConfig(analyzer="code", **cfg)).build(
        spark.createDataFrame(camel).drop("content_sha256"), d1
    )
    IndexBuilder(spark, IndexConfig(**cfg)).build(
        spark.createDataFrame(presplit).drop("content_sha256"), d2
    )
    yield SearchIndex(spark, d1), SearchIndex(spark, d2)
    shutil.rmtree(d1, ignore_errors=True)
    shutil.rmtree(d2, ignore_errors=True)


def test_code_index_equals_presplit_standard(code_index_pair):
    code_ix, std_ix = code_index_pair
    assert code_ix.stats.doc_count == std_ix.stats.doc_count
    assert code_ix.stats.sum_total_term_freq == std_ix.stats.sum_total_term_freq
    # identical postings for a few common terms
    a = code_ix.collect_postings(["return", "class", "data"])
    b = std_ix.collect_postings(["return", "class", "data"])
    for t in a:
        np.testing.assert_array_equal(a[t].docs, b[t].docs)
        np.testing.assert_array_equal(a[t].tfs, b[t].tfs)
        np.testing.assert_array_equal(a[t].norms, b[t].norms)


def test_code_search_scores_equal_presplit(code_index_pair):
    code_ix, std_ix = code_index_pair
    sc, ss = Searcher(code_ix), Searcher(std_ix)
    for q in ["return", "return AND class", '"the data"', "return OR class OR data"]:
        assert sc.search(q, k=10).hits == ss.search(q, k=10).hits, q


def test_query_side_expansion(code_index_pair):
    """QueryBuilder.createFieldQuery: an unquoted camelCase query term
    splits into a SHOULD boolean; a quoted one splices into the phrase."""
    code_ix, std_ix = code_index_pair
    sc, ss = Searcher(code_ix), Searcher(std_ix)
    assert sc.search("returnClass", k=10).hits == ss.search("return OR class", k=10).hits
    got = sc.search('"returnDef"', k=10)
    want = ss.search('"return def"', k=10)
    assert got.hits == want.hits and want.total_hits > 0
    # phrase with a mixed identifier splices parts in order
    assert sc.search('"return_def"', k=10).hits == want.hits


def test_distributed_mode_matches_driver(code_index_pair):
    code_ix, _ = code_index_pair
    sc = Searcher(code_ix)
    a = sc.search("return AND class", k=10)
    b = sc.search("return AND class", k=10, mode="distributed")
    assert a.hits == b.hits
