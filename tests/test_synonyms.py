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


class TestGraphSynonyms:
    """Multi-word (graph) rules — QueryBuilder.analyzeGraphBoolean
    (:503-560, newGraphSynonymQuery :617-624) and analyzeGraphPhrase
    (:565-582): SHOULD boolean of per-path queries."""

    def test_term_with_multiword_output(self):
        syn = SynonymMap([("usa", "united states")])
        got = expand_synonyms(A.TermQuery("usa"), syn)
        assert got == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("usa")),
                (A.Occur.SHOULD, A.PhraseQuery(("united", "states"))),
            )
        )

    def test_multiword_input_matches_nothing_on_single_term(self):
        syn = SynonymMap([("new york", "nyc")])
        assert expand_synonyms(A.TermQuery("new"), syn) == A.TermQuery("new")
        # the single-token member still expands (bidirectional group)
        got = expand_synonyms(A.TermQuery("nyc"), syn)
        assert got == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("nyc")),
                (A.Occur.SHOULD, A.PhraseQuery(("new", "york"))),
            )
        )

    def test_replacement_to_multiword_drops_original(self):
        from lucene_spark.analysis.synonyms import parse_solr_synonyms

        syn = parse_solr_synonyms("usa => united states\n", allow_multi_word=True)
        got = expand_synonyms(A.TermQuery("usa"), syn)
        assert got == A.BooleanQuery(
            ((A.Occur.SHOULD, A.PhraseQuery(("united", "states"))),)
        )
        assert A.rewrite(got) == A.PhraseQuery(("united", "states"))

    def test_phrase_paths(self):
        syn = SynonymMap([("usa", "united states")])
        got = expand_synonyms(A.PhraseQuery(("big", "usa", "city"), slop=1), syn)
        assert got == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.PhraseQuery(("big", "usa", "city"), slop=1)),
                (A.Occur.SHOULD, A.PhraseQuery(("big", "united", "states", "city"), slop=1)),
            )
        )

    def test_phrase_multiword_input_consecutive_match(self):
        syn = SynonymMap([("new york", "nyc")])
        got = expand_synonyms(A.PhraseQuery(("in", "new", "york", "now")), syn)
        assert got == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.PhraseQuery(("in", "new", "york", "now"))),
                (A.Occur.SHOULD, A.PhraseQuery(("in", "nyc", "now"))),
            )
        )
        # non-consecutive run never matches
        q2 = A.PhraseQuery(("new", "x", "york"))
        assert expand_synonyms(q2, syn) == q2

    def test_single_token_path_becomes_term(self):
        syn = SynonymMap([("new york", "nyc")])
        got = expand_synonyms(A.PhraseQuery(("new", "york")), syn)
        assert got == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.PhraseQuery(("new", "york"))),
                (A.Occur.SHOULD, A.TermQuery("nyc")),
            )
        )

    def test_parser_gate_and_index_sets_guard(self):
        import pytest

        from lucene_spark.analysis.synonyms import index_sets, parse_solr_synonyms

        with pytest.raises(ValueError, match="multi-word"):
            parse_solr_synonyms("usa, united states\n")
        syn = parse_solr_synonyms("usa, united states\n", allow_multi_word=True)
        with pytest.raises(ValueError, match="multi-word"):
            index_sets(syn)
        with pytest.raises(ValueError, match="multi-word INPUT"):
            parse_solr_synonyms("united states => usa\n", allow_multi_word=True)

    def test_multiphrase_slot_guard(self):
        import pytest

        syn = SynonymMap([("usa", "united states")])
        with pytest.raises(ValueError, match="MultiPhrase"):
            expand_synonyms(A.MultiPhraseQuery((("usa",), ("x",))), syn)

    def test_path_explosion_capped(self):
        import pytest

        syn = SynonymMap([("a", "x y")])
        with pytest.raises(ValueError, match="paths"):
            expand_synonyms(A.PhraseQuery(tuple(["a"] * 11)), syn)

    def test_e2e_scores_are_sum_of_path_queries(self, search_index):
        s = Searcher(search_index, total_hits_threshold=10**9)
        syn = SynonymMap([("return", "if int")])
        q = expand_synonyms(A.TermQuery("return"), syn)
        got = dict(s.search(q, k=10**6).hits)
        a = dict(s.search(A.TermQuery("return"), k=10**6).hits)
        b = dict(s.search(A.PhraseQuery(("if", "int")), k=10**6).hits)
        import numpy as np
        import pytest as _pt

        want = {d: float(np.float32(a.get(d, 0.0)) + np.float32(b.get(d, 0.0))) for d in set(a) | set(b)}
        assert set(got) == set(want)
        for d in got:
            assert got[d] == _pt.approx(want[d], rel=1e-6)
