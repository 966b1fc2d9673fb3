"""Surround query parser (lucene/queryparser/surround role): grammar →
interval-algebra AST, and distance-op search equivalence with
SpanNearQuery (same minimal-interval + sloppy-freq semantics)."""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.intervals import IMaxGaps, IOr, IOrdered, ITerm, IUnordered
from lucene_spark.search.surround import parse_surround


class TestGrammar:
    def test_prefix_distance_ops(self):
        q = parse_surround("3W(table, hash)")
        assert q == A.IntervalQuery(IMaxGaps(2, IOrdered((ITerm("table"), ITerm("hash")))), score_mode="span")
        q = parse_surround("N(a, b)")
        assert q == A.IntervalQuery(IMaxGaps(0, IUnordered((ITerm("a"), ITerm("b")))), score_mode="span")

    def test_infix_distance(self):
        q = parse_surround("table 3W hash")
        assert q == A.IntervalQuery(IMaxGaps(2, IOrdered((ITerm("table"), ITerm("hash")))), score_mode="span")
        # left-associative chain
        q = parse_surround("a 2W b 5N c")
        inner = IMaxGaps(1, IOrdered((ITerm("a"), ITerm("b"))))
        assert q == A.IntervalQuery(IMaxGaps(4, IUnordered((inner, ITerm("c")))), score_mode="span")

    def test_or_inside_distance(self):
        q = parse_surround("2W(table OR merge, hash)")
        assert q == A.IntervalQuery(
            IMaxGaps(1, IOrdered((IOr((ITerm("table"), ITerm("merge"))), ITerm("hash")))),
            score_mode="span",
        )

    def test_nested_distance(self):
        q = parse_surround("4N(W(a, b), c)")
        assert q == A.IntervalQuery(
            IMaxGaps(3, IUnordered((IMaxGaps(0, IOrdered((ITerm("a"), ITerm("b")))), ITerm("c")))),
            score_mode="span",
        )

    def test_boolean_level(self):
        # surround NOT is infix: x NOT y (QueryParser.jj NotQuery)
        q = parse_surround("3W(a, b) NOT c")
        assert q == A.BooleanQuery(
            (
                (A.Occur.MUST, A.IntervalQuery(IMaxGaps(2, IOrdered((ITerm("a"), ITerm("b")))), score_mode="span")),
                (A.Occur.MUST_NOT, A.TermQuery("c")),
            )
        )
        q2 = parse_surround("merge AND 2N(a, b)")
        assert isinstance(q2, A.BooleanQuery) and len(q2.clauses) == 2

    def test_case_and_default_distance(self):
        assert parse_surround("W(A, B)") == A.IntervalQuery(
            IMaxGaps(0, IOrdered((ITerm("a"), ITerm("b")))), score_mode="span"
        )

    def test_prefix_term_outside_distance(self):
        q = parse_surround("tab* AND merge")
        assert q == A.BooleanQuery(
            ((A.Occur.MUST, A.PrefixQuery("tab")), (A.Occur.MUST, A.TermQuery("merge")))
        )

    def test_rejects_truncation_inside_distance(self):
        with pytest.raises(ValueError):
            parse_surround("3W(tab*, hash)")

    def test_rejects_and_inside_distance(self):
        with pytest.raises(ValueError):
            parse_surround("3W(a AND b, c)")


class TestSearchEquivalence:
    def test_w_equals_spannear_ordered(self, spark, search_index):
        s = Searcher(search_index)
        a = s.search(parse_surround("3W(return, if)"), k=20).hits
        b = s.search(A.SpanNearQuery(("return", "if"), slop=2, in_order=True), k=20).hits
        assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b]

    def test_n_equals_spannear_unordered(self, spark, search_index):
        s = Searcher(search_index)
        a = s.search(parse_surround("return 4N if"), k=20).hits
        b = s.search(A.SpanNearQuery(("return", "if"), slop=3, in_order=False), k=20).hits
        assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b]
