"""EnglishAnalyzer pipeline: possessive strip → lowercase → stop
removal (position-consuming) → Porter stem, index-side and query-side.

Reference: EnglishAnalyzer.java:43-53 (stop set), :102-110 (chain);
EnglishPossessiveFilter.java:38-52; StopFilter position increments.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    tokenize,
    tokenize_pos_series,
)
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.testing.oracle import OracleIndex

import pandas as pd

TEXTS = {
    0: "the manager's table is running quickly",
    1: "tables are managed by the manager",
    2: "no quick table there",
    3: "managers manage the managed tables",
    4: "a dog's life with the dogs",
    5: "running tables running managers running dogs",
}


class TestPipeline:
    def test_stop_set_is_the_reference_33(self):
        assert len(ENGLISH_STOP_WORDS) == 33
        assert {"the", "a", "with", "will", "these"} <= ENGLISH_STOP_WORDS
        assert "quick" not in ENGLISH_STOP_WORDS

    def test_possessive_then_stem(self):
        assert tokenize("The Manager's table", stem="english") == ["manag", "tabl"]
        # ’s and ＇s variants (EnglishPossessiveFilter.java:43-46)
        assert tokenize("manager’s", stem="english") == ["manag"]
        assert tokenize("manager＇S", stem="english") == ["manag"]
        # 's only strips when the PENULTIMATE char is the apostrophe
        assert tokenize("managers", stem="english") == ["manag"]

    def test_stopwords_removed(self):
        assert tokenize("the cat is on the mat", stem="english") == ["cat", "mat"]
        # all-stopword text analyzes to nothing
        assert tokenize("it was they that will be", stem="english") == []

    def test_positions_consume_stopwords(self):
        toks, poss = tokenize_pos_series(pd.Series([TEXTS[0]]), stem="english")
        # the(0) manager's(1) table(2) is(3) running(4) quickly(5)
        assert toks[0] == ["manag", "tabl", "run", "quickli"]
        assert poss[0] == [1, 2, 4, 5]


@pytest.fixture(scope="module")
def english_setup(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    rows = [
        {
            "repo": "r",
            "path": f"p{doc:03}",
            "commit": "c",
            "lang": "en",
            "content": text,
        }
        for doc, text in TEXTS.items()
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    d = str(tmp_path_factory.mktemp("eng_index"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=4, term_buckets=2, analyzer="english")).build(
        df, d
    )
    index = SearchIndex(spark, d)
    # oracle over the SAME analyzed tokens + gap-preserving positions
    toks_s, poss_s = tokenize_pos_series(pd.Series([TEXTS[i] for i in sorted(TEXTS)]), stem="english")
    oracle = OracleIndex(
        {i: toks_s[i] for i in sorted(TEXTS)}, {i: poss_s[i] for i in sorted(TEXTS)}
    )
    return Searcher(index), oracle


class TestEnglishIndex:
    def test_term_query_stems_and_matches_oracle(self, english_setup):
        s, oracle = english_setup
        got = s.search(A.TermQuery("tables"), k=10).hits  # query side stems to 'tabl'
        want = oracle.top_k(A.TermQuery("tabl"), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert np.allclose([x for _, x in got], [x for _, x in want], rtol=1e-6)

    def test_bare_stopword_matches_nothing(self, english_setup):
        s, _ = english_setup
        assert s.search(A.TermQuery("the"), k=10).hits == []

    def test_stopword_must_clause_is_dropped(self, english_setup):
        s, oracle = english_setup
        q = A.BooleanQuery(
            ((A.Occur.MUST, A.TermQuery("manager")), (A.Occur.MUST, A.TermQuery("the")))
        )
        got = s.search(q, k=10).hits
        want = oracle.top_k(A.TermQuery("manag"), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]

    def test_phrase_gap_semantics(self, english_setup):
        s, _ = english_setup
        # "running quickly": adjacent survivors (positions 4,5) → match
        assert 0 in {d for d, _ in s.search(A.PhraseQuery(("running", "quickly")), k=10).hits}
        # "table is running": index keeps the stop gap (doc0: tabl@2 →
        # run@4), query drops 'is' without a gap → doc0 misses the
        # exact phrase (doc5 has a literal adjacent "tables running"
        # and rightly matches); slop covers the gap
        exact = {d for d, _ in s.search(A.PhraseQuery(("table", "is", "running")), k=10).hits}
        assert 0 not in exact and 5 in exact
        sloppy = {d for d, _ in s.search(A.PhraseQuery(("table", "is", "running"), slop=2), k=10).hits}
        assert 0 in sloppy

    def test_possessive_query_form(self, english_setup):
        s, oracle = english_setup
        got = s.search(A.TermQuery("dog's"), k=10).hits
        want = oracle.top_k(A.TermQuery("dog"), k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert {d for d, _ in got} == {4, 5}

    def test_all_stop_query_is_match_nothing(self, english_setup):
        s, _ = english_setup
        td = s.search(A.BooleanQuery(((A.Occur.SHOULD, A.TermQuery("the")), (A.Occur.SHOULD, A.TermQuery("was")))), k=10)
        assert td.hits == [] and td.total_hits == 0
