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


class TestSolrSynonymParser:
    """SolrSynonymParser format (SolrSynonymParser.java:82-137):
    explicit '=>' mappings replace (includeOrig=false) and merge across
    lines; equivalence lines follow the expand flag."""

    def test_equivalence_expand(self):
        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        m = parse_solr_synonyms("# comment\n\nipod, ipud, ipd\n")
        assert set(m.alts("ipod")) == {"ipud", "ipd"}
        assert set(m.alts("ipd")) == {"ipod", "ipud"}
        assert not m.replace

    def test_equivalence_noexpand_maps_to_first(self):
        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        m = parse_solr_synonyms("ipod, ipud, ipd\n", expand=False)
        assert not m.map
        assert m.replace["ipud"] == ("ipod",) and m.replace["ipd"] == ("ipod",)
        # the first member maps to itself (type change only in Lucene)
        assert m.replace["ipod"] == ("ipod",)

    def test_explicit_mapping_replaces_and_merges(self):
        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        m = parse_solr_synonyms("foo => bar\nfoo => baz\na, b => c\n")
        assert m.replace["foo"] == ("bar", "baz")
        assert m.replace["a"] == ("c",) and m.replace["b"] == ("c",)

    def test_escaped_separators(self):
        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        m = parse_solr_synonyms("a\\,b, c\n")
        assert set(m.alts("a,b")) == {"c"}

    def test_errors(self):
        import pytest

        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        with pytest.raises(ValueError, match="multi-word"):
            parse_solr_synonyms("sea biscuit, seabiscuit\n")
        with pytest.raises(ValueError, match="more than one explicit"):
            parse_solr_synonyms("a => b => c\n")
        with pytest.raises(ValueError, match=">= 2 terms"):
            parse_solr_synonyms("lonely\n")

    def test_replacement_drives_query_rewrite(self):
        from lucene_spark.analysis.synonyms import expand_synonyms, parse_solr_synonyms
        from lucene_spark.search import ast as A

        m = parse_solr_synonyms("foo => bar\nx => y, z\nquick, fast\n")
        # single replacement output -> plain TermQuery of the output
        assert expand_synonyms(A.TermQuery("foo"), m) == A.TermQuery("bar")
        # multiple outputs, original NOT kept
        assert expand_synonyms(A.TermQuery("x"), m) == A.SynonymQuery(("y", "z"))
        # equivalence keeps the original
        assert expand_synonyms(A.TermQuery("quick"), m) == A.SynonymQuery(("quick", "fast"))
        # phrase slot substitution
        got = expand_synonyms(A.PhraseQuery(("foo", "quick")), m)
        assert got == A.MultiPhraseQuery((("bar",), ("quick", "fast")))

    def test_index_sets_roundtrip_and_guard(self):
        import pytest

        from lucene_spark.analysis.synonyms import index_sets, parse_solr_synonyms

        m = parse_solr_synonyms("quick, fast\nbig, large, huge\n")
        assert index_sets(m) == (("quick", "fast"), ("big", "large", "huge"))
        with pytest.raises(ValueError, match="expand-equivalence"):
            index_sets(parse_solr_synonyms("a => b\n"))
        with pytest.raises(ValueError, match="expand-equivalence"):
            index_sets(parse_solr_synonyms("a, b\n", expand=False))
