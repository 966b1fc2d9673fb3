"""SimpleQueryParser (lucene/queryparser/simple) — golden parse trees
mirroring SimpleQueryParserTests.java shapes, graceful-degradation
cases, and e2e equivalence with the classic parser."""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.simpleparser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    SimpleQueryParser,
    parse_simple,
)

T = A.TermQuery
S, M, N = A.Occur.SHOULD, A.Occur.MUST, A.Occur.MUST_NOT


def bq(*clauses):
    return A.BooleanQuery(tuple(clauses))


class TestGoldenTrees:
    def test_single_term(self):
        assert parse_simple("foo") == T("foo")

    def test_whitespace_or(self):
        assert parse_simple("foo bar") == bq((S, T("foo")), (S, T("bar")))

    def test_plus_and(self):
        assert parse_simple("foo+bar") == bq((M, T("foo")), (M, T("bar")))

    def test_pipe_or(self):
        assert parse_simple("foo|bar") == bq((S, T("foo")), (S, T("bar")))

    def test_right_to_left_precedence(self):
        # "a | b + c" == (a OR b) AND c (junction change wraps the tree)
        got = parse_simple("a | b + c")
        assert got == bq((M, bq((S, T("a")), (S, T("b")))), (M, T("c")))

    def test_parens_precedence(self):
        got = parse_simple("a + (b | c)")
        assert got == bq((M, T("a")), (M, bq((S, T("b")), (S, T("c")))))

    def test_negation_shape(self):
        # the reference wraps as (MUST_NOT x, SHOULD MatchAll); rewrite
        # may simplify but the match-set semantics must be NOT x
        got = parse_simple("-foo")
        assert got == A.rewrite(bq((N, T("foo")), (S, A.MatchAllDocsQuery())))

    def test_double_negation_cancels(self):
        assert parse_simple("--foo") == T("foo")

    def test_phrase_with_slop(self):
        assert parse_simple('"foo bar"~3') == A.PhraseQuery(("foo", "bar"), slop=3)

    def test_single_term_phrase_collapses(self):
        assert parse_simple('"foo"') == T("foo")

    def test_prefix(self):
        assert parse_simple("Foo*") == A.PrefixQuery("foo")

    def test_fuzzy_default_and_capped(self):
        assert parse_simple("foo~") == A.FuzzyQuery("foo", max_edits=2)
        assert parse_simple("foo~1") == A.FuzzyQuery("foo", max_edits=1)
        assert parse_simple("foo~9") == A.FuzzyQuery("foo", max_edits=2)  # cap
        assert parse_simple("foo~0") == T("foo")  # 0 edits = plain term

    def test_fuzzy_garbage_suffix_is_zero(self):
        assert parse_simple("foo~zz") == T("foo")

    def test_match_all_star(self):
        assert parse_simple(" * ") == A.MatchAllDocsQuery()

    def test_empty_is_match_none(self):
        assert isinstance(parse_simple(""), A.MatchNoDocsQuery)
        assert isinstance(parse_simple("()"), A.MatchNoDocsQuery)

    def test_default_operator_must(self):
        got = parse_simple("foo bar", default_operator=M)
        assert got == bq((M, T("foo")), (M, T("bar")))


class TestGracefulDegradation:
    def test_unmatched_paren_is_extraneous(self):
        assert parse_simple("(foo bar") == parse_simple("foo bar")
        assert parse_simple("foo) bar") == parse_simple("foo bar")

    def test_unmatched_quote_is_extraneous(self):
        assert parse_simple('"foo bar') == parse_simple("foo bar")

    def test_leading_junction_ignored(self):
        assert parse_simple("+foo") == T("foo")
        assert parse_simple("| foo") == T("foo")

    def test_doubled_junction_ignored(self):
        assert parse_simple("foo ++ bar") == bq((M, T("foo")), (M, T("bar")))

    def test_escaped_operator_is_literal(self):
        # '\|' is not a junction; the analyzer then strips the bar
        assert parse_simple(r"foo \| bar") == bq((S, T("foo")), (S, T("bar")))

    def test_disabled_flags_treat_syntax_as_text(self):
        p = SimpleQueryParser(flags=0)  # everything off -> one token
        assert p.parse('foo+bar') == bq((S, T("foo")), (S, T("bar")))  # analyzer splits foo+bar

    def test_flag_gating_phrase(self):
        from lucene_spark.search.simpleparser import WHITESPACE_OPERATOR

        # phrase operator OFF: quotes are literal token chars, stripped
        # by analysis -> two OR'd terms, NOT a PhraseQuery
        p = SimpleQueryParser(flags=WHITESPACE_OPERATOR | AND_OPERATOR)
        assert p.parse('"foo bar"') == bq((S, T("foo")), (S, T("bar")))

    def test_never_raises_fuzz(self):
        import numpy as np

        rng = np.random.default_rng(3)
        alphabet = list('ab +|-"()*~\\')
        for _ in range(500):
            s = "".join(rng.choice(alphabet, size=int(rng.integers(0, 25))))
            parse_simple(s)  # must not raise


class TestEndToEnd:
    def test_matches_classic_equivalents(self, search_index):
        from lucene_spark.search.parser import parse_query

        s = Searcher(search_index)
        pairs = [
            ("return int", "return int"),
            ("return+int", "return AND int"),
            ('"return if"~2', '"return if"~2'),
            ("ret*", "ret*"),
        ]
        for simple, classic in pairs:
            got = s.search(parse_simple(simple), k=10).hits
            want = s.search(parse_query(classic), k=10).hits
            assert [(d, round(x, 5)) for d, x in got] == [(d, round(x, 5)) for d, x in want], simple

    def test_negation_match_set(self, search_index, oracle):
        s = Searcher(search_index)
        got = {d for d, _ in s.search(parse_simple("-return"), k=10**6).hits}
        matched = {d for d, _ in oracle.top_k(A.TermQuery("return"), k=10**9)}
        assert got == set(range(200)) - matched
