"""KeywordRepeatFilter + PorterStemFilter + RemoveDuplicates
(miscellaneous/KeywordRepeatFilter.java:28-44,
RemoveDuplicatesTokenFilter.java:30-60): surface form + stem stacked at
one position; query side rewrites to SynonymQuery / multiphrase
alternatives (QueryBuilder graph-token path)."""

import shutil

import pytest

from lucene_spark.analysis.porter import porter_stem
from lucene_spark.analysis.shingles import stem_repeat_stream
from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


class TestStream:
    def test_basic_stacking(self):
        t, p, o = stem_repeat_stream(["running", "fast", "tables"], [0, 1, 2])
        assert t == ["running", "run", "fast", "tables", "tabl"]
        assert p == [0, 0, 1, 2, 2]
        assert o == [False, True, False, False, True]

    def test_remove_duplicates_rule(self):
        # stem == surface -> ONE token (RemoveDuplicatesTokenFilter)
        t, p, o = stem_repeat_stream(["run", "if"], [0, 1])
        assert t == ["run", "if"] and o == [False, False]

    def test_offsets_duplicate(self):
        t, p, o, s, e = stem_repeat_stream(["running"], [0], [5], [12])
        assert t == ["running", "run"]
        assert s == [5, 5] and e == [12, 12]

    def test_position_holes_preserved(self):
        t, p, o = stem_repeat_stream(["running", "jumps"], [0, 3])
        assert p == [0, 0, 3, 3]


@pytest.fixture(scope="module")
def sr_index(tmp_path_factory, spark, corpus_df):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    d = str(tmp_path_factory.mktemp("sr_index"))
    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, positions=True, stem_repeat=True)
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256"), d)
    ix = SearchIndex(spark, d)
    yield ix
    shutil.rmtree(d, ignore_errors=True)


def _ordered(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


class TestEngine:
    def test_rewrite_shapes(self, sr_index):
        s = Searcher(sr_index)
        assert s._stem_repeat_query(A.TermQuery("returns")) == A.SynonymQuery(
            ("returns", "return")
        )
        assert s._stem_repeat_query(A.TermQuery("if")) == A.TermQuery("if")
        assert s._stem_repeat_query(A.PhraseQuery(("returns", "if"))) == A.MultiPhraseQuery(
            (("returns", "return"), ("if",))
        )

    def test_statistics_split(self, sr_index, corpus_pdf):
        # norms discount the stacked stems; sum_ttf counts every posting
        want_sum, want_docs = 0, 0
        for t in _ordered(corpus_pdf)["content"]:
            toks = tokenize(t)
            st, _p, _o = stem_repeat_stream(toks, list(range(len(toks))))
            want_sum += len(st)
            want_docs += 1
        assert sr_index.stats.doc_count == want_docs
        assert sr_index.stats.sum_total_term_freq == want_sum

    def test_term_matches_exact_and_stemmed(self, sr_index, corpus_pdf):
        s = Searcher(sr_index)
        got = {d for d, _ in s.search(A.TermQuery("returns"), k=10**6).hits}
        alts = {"returns", porter_stem("returns")}
        ordered = _ordered(corpus_pdf)
        want = set()
        for i in range(len(ordered)):
            indexed = set()
            for t in tokenize(ordered.loc[i, "content"]):
                indexed.add(t)
                indexed.add(porter_stem(t))
            if indexed & alts:
                want.add(i)
        assert got == want

    def test_rewrite_equals_explicit_synonym(self, sr_index):
        s = Searcher(sr_index)
        a = s.search(A.TermQuery("returns"), k=10).hits
        b = s.search(A.SynonymQuery(("returns", "return")), k=10).hits
        assert a == b

    def test_phrase_multiphrase_alternatives(self, sr_index, corpus_pdf):
        # "returns if" must match docs whose surface text has
        # "return(s)-stemming token followed by if"
        s = Searcher(sr_index)
        got = {d for d, _ in s.search(A.PhraseQuery(("returns", "if")), k=10**6).hits}
        ordered = _ordered(corpus_pdf)
        want = set()
        alts0 = {"returns", "return"}
        for i in range(len(ordered)):
            toks = tokenize(ordered.loc[i, "content"])
            # indexed alternatives at each position: {tok, stem(tok)}
            for a, b in zip(toks, toks[1:]):
                if ({a, porter_stem(a)} & alts0) and b == "if":
                    want.add(i)
                    break
        assert got == want

    def test_distributed_twin(self, sr_index):
        s = Searcher(sr_index)
        drv = s.search(A.TermQuery("returns"), k=10).hits
        dist = s.search(A.TermQuery("returns"), k=10, mode="distributed").hits
        assert [d for d, _ in drv] == [d for d, _ in dist]

    def test_mutually_exclusive_with_shingles(self, spark):
        from lucene_spark.index.builder import IndexConfig, _stacker_of

        with pytest.raises(ValueError, match="mutually exclusive"):
            _stacker_of(IndexConfig(stem_repeat=True, shingles=(2, 2)))
