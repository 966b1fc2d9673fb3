"""Query-time synonym expansion (SynonymGraphFilter / QueryBuilder
newSynonymQuery role): golden rewrites + e2e equivalence with explicit
SynonymQuery / MultiPhraseQuery."""

from __future__ import annotations

from lucene_spark.analysis.synonyms import SynonymMap, expand_synonyms
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher

SYN = {"table": ("merge",), "hash": ("scan", "dup")}


class TestRewrite:
    def test_term_becomes_synonym_query(self):
        assert expand_synonyms(A.TermQuery("table"), SYN) == A.SynonymQuery(("table", "merge"))

    def test_unmapped_term_untouched(self):
        assert expand_synonyms(A.TermQuery("vector"), SYN) == A.TermQuery("vector")

    def test_group_form_is_bidirectional(self):
        syn = SynonymMap([("big", "large", "huge")])
        assert expand_synonyms(A.TermQuery("large"), syn) == A.SynonymQuery(("large", "big", "huge"))

    def test_phrase_grows_multiphrase_slots(self):
        got = expand_synonyms(A.PhraseQuery(("table", "vector"), slop=2), SYN)
        assert got == A.MultiPhraseQuery((("table", "merge"), ("vector",)), slop=2)

    def test_phrase_without_hits_untouched(self):
        q = A.PhraseQuery(("vector", "merge"))
        assert expand_synonyms(q, {"table": ("x",)}) == q

    def test_boolean_recursion_and_field_scoping(self):
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("table")),
                (A.Occur.SHOULD, A.TermQuery("table", field="title")),
            )
        )
        got = expand_synonyms(q, SYN)
        assert got.clauses[0][1] == A.SynonymQuery(("table", "merge"))
        assert got.clauses[1][1] == A.TermQuery("table", field="title")  # other field untouched

    def test_multi_term_patterns_never_analyzed(self):
        for q in (A.PrefixQuery("tab"), A.WildcardQuery("tab*"), A.FuzzyQuery("table")):
            assert expand_synonyms(q, SYN) == q

    def test_existing_synonym_query_extends(self):
        got = expand_synonyms(A.SynonymQuery(("table",)), SYN)
        assert got == A.SynonymQuery(("table", "merge"))


class TestEndToEnd:
    def test_term_expansion_equals_explicit_synonym(self, search_index):
        s = Searcher(search_index)
        syn = {"return": ("int",)}
        got = s.search(expand_synonyms(A.TermQuery("return"), syn), k=10).hits
        want = s.search(A.SynonymQuery(("return", "int")), k=10).hits
        assert got == want

    def test_phrase_expansion_equals_explicit_multiphrase(self, search_index):
        s = Searcher(search_index)
        syn = {"return": ("int",)}
        got = s.search(expand_synonyms(A.PhraseQuery(("return", "if")), syn), k=10).hits
        want = s.search(A.MultiPhraseQuery((("return", "int"), ("if",))), k=10).hits
        assert got == want
