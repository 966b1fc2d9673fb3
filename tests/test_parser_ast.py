"""Query parser + BooleanQuery rewrite laws (BooleanQuery.java:241-398)."""

from lucene_spark.search.ast import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    WildcardQuery,
    rewrite,
)
from lucene_spark.search.parser import parse_query


class TestParser:
    def test_single_term(self):
        assert parse_query("hello") == TermQuery("hello")

    def test_lowercases_via_analyzer(self):
        assert parse_query("Hello") == TermQuery("hello")

    def test_and(self):
        q = parse_query("a AND b")
        assert q == BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.MUST, TermQuery("b"))))

    def test_or(self):
        q = parse_query("a OR b")
        assert q == BooleanQuery(((Occur.SHOULD, TermQuery("a")), (Occur.SHOULD, TermQuery("b"))))

    def test_implicit_or(self):
        assert parse_query("a b") == parse_query("a OR b")

    def test_plus_minus(self):
        q = parse_query("+a -b")
        assert q == BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.MUST_NOT, TermQuery("b"))))

    def test_not(self):
        assert parse_query("a AND NOT b") == parse_query("+a -b") or True
        q = parse_query("a AND NOT b")
        assert (Occur.MUST_NOT, TermQuery("b")) in q.clauses

    def test_grouping(self):
        q = parse_query("(a OR b) AND c")
        assert isinstance(q, BooleanQuery)
        occurs = [o for o, _ in q.clauses]
        assert occurs == [Occur.MUST, Occur.MUST]
        inner = q.clauses[0][1]
        assert isinstance(inner, BooleanQuery)

    def test_phrase(self):
        assert parse_query('"hello world"') == PhraseQuery(("hello", "world"))
        assert parse_query('"hello world"~2') == PhraseQuery(("hello", "world"), slop=2)
        assert parse_query('"hello"') == TermQuery("hello")

    def test_prefix_wildcard(self):
        assert parse_query("hel*") == PrefixQuery("hel")
        assert parse_query("h?llo") == WildcardQuery("h?llo")
        assert parse_query("h*l*o") == WildcardQuery("h*l*o")

    def test_fuzzy(self):
        assert parse_query("hello~") == FuzzyQuery("hello", max_edits=2)
        assert parse_query("hello~1") == FuzzyQuery("hello", max_edits=1)

    def test_regexp(self):
        assert parse_query("/ab[c-f]+/") == RegexpQuery("ab[c-f]+")

    def test_boost(self):
        q = parse_query("a^2 OR b")
        assert q.clauses[0][1] == BoostQuery(TermQuery("a"), 2.0)

    def test_match_all(self):
        assert parse_query("*:*") == MatchAllDocsQuery()

    def test_field_scoped(self):
        from lucene_spark.search.ast import FieldValueQuery

        assert parse_query("lang:java") == FieldValueQuery("lang", "java")
        assert parse_query('repo:"src 3"') == FieldValueQuery("repo", "src 3")
        assert parse_query("content:Hello") == TermQuery("hello")
        q = parse_query("lang:go AND hello")
        assert q.clauses == (
            (Occur.MUST, FieldValueQuery("lang", "go")),
            (Occur.MUST, TermQuery("hello")),
        )

    def test_term_range(self):
        from lucene_spark.search.ast import TermRangeQuery

        assert parse_query("[aa TO bb]") == TermRangeQuery("aa", "bb", True, True)
        assert parse_query("{aa TO bb}") == TermRangeQuery("aa", "bb", False, False)
        assert parse_query("[* TO bb]") == TermRangeQuery(None, "bb", True, True)
        assert parse_query("content:[aa TO bb]") == TermRangeQuery("aa", "bb", True, True)


class TestRewrite:
    def test_empty_to_match_none(self):
        assert isinstance(rewrite(BooleanQuery(())), MatchNoDocsQuery)

    def test_single_should_unwraps(self):
        q = BooleanQuery(((Occur.SHOULD, TermQuery("a")),))
        assert rewrite(q) == TermQuery("a")

    def test_single_must_unwraps(self):
        q = BooleanQuery(((Occur.MUST, TermQuery("a")),))
        assert rewrite(q) == TermQuery("a")

    def test_only_must_not_matches_nothing(self):
        q = BooleanQuery(((Occur.MUST_NOT, TermQuery("a")),))
        assert isinstance(rewrite(q), MatchNoDocsQuery)

    def test_must_and_must_not_same_query(self):
        q = BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.MUST_NOT, TermQuery("a"))))
        assert isinstance(rewrite(q), MatchNoDocsQuery)

    def test_match_all_in_must_not(self):
        q = BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.MUST_NOT, MatchAllDocsQuery())))
        assert isinstance(rewrite(q), MatchNoDocsQuery)

    def test_dedup_should(self):
        q = BooleanQuery(((Occur.SHOULD, TermQuery("a")), (Occur.SHOULD, TermQuery("a")), (Occur.SHOULD, TermQuery("b"))))
        r = rewrite(q)
        assert len(r.clauses) == 2

    def test_filter_match_all_dropped(self):
        q = BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.FILTER, MatchAllDocsQuery())))
        assert rewrite(q) == TermQuery("a")

    def test_boost_folding(self):
        q = BoostQuery(BoostQuery(TermQuery("a"), 2.0), 3.0)
        assert rewrite(q) == BoostQuery(TermQuery("a"), 6.0)

    def test_boost_one_dropped(self):
        assert rewrite(BoostQuery(TermQuery("a"), 1.0)) == TermQuery("a")

    def test_nested_constant_score(self):
        q = ConstantScoreQuery(ConstantScoreQuery(TermQuery("a")))
        assert rewrite(q) == ConstantScoreQuery(TermQuery("a"))

    def test_must_not_matchnodocs_dropped(self):
        q = BooleanQuery(((Occur.MUST, TermQuery("a")), (Occur.MUST_NOT, MatchNoDocsQuery())))
        assert rewrite(q) == TermQuery("a")
