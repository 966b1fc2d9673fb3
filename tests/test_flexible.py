"""StandardQueryParser ``fn:`` interval functions — golden parse trees,
atLeast/unorderedNoOverlaps semantics vs definitional brutes, and e2e
parity with hand-built interval trees in both execution modes."""

from __future__ import annotations

import random
from itertools import combinations, product

import numpy as np
import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.flexible import at_least, parse_interval_fn, unordered_no_overlaps
from lucene_spark.search.intervals import (
    IContainedBy,
    IExtend,
    IMaxGaps,
    IMaxWidth,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    eval_source,
)
from tests.test_intervals import brute, brute_minimalize


class TestParseGoldens:
    def test_nested_positional(self):
        q = parse_interval_fn("fn:maxgaps(2 fn:ordered(table hash))")
        assert q == A.IntervalQuery(
            IMaxGaps(2, IOrdered((ITerm("table"), ITerm("hash")))), "content"
        )

    def test_case_variants(self):
        assert parse_interval_fn("fn:maxGaps(1 fn:unorderedNoOverlaps(a b))") == \
            parse_interval_fn("fn:maxgaps(1 fn:unorderednooverlaps(a b))")

    def test_field_prefix(self):
        q = parse_interval_fn("title:fn:ordered(big table)")
        assert q.field == "title"

    def test_quoted_text_is_adjacency_block(self):
        # AnalyzedText multi-word → Intervals.analyzedText(gaps=0, ordered)
        q = parse_interval_fn('fn:containing(fn:unordered(a b) "x y")')
        small = q.source.small
        assert small == IMaxGaps(0, IOrdered((ITerm("x"), ITerm("y"))))

    def test_phrase_fn(self):
        q = parse_interval_fn("fn:phrase(one two three)")
        assert q.source == IMaxGaps(
            0, IOrdered((ITerm("one"), ITerm("two"), ITerm("three")))
        )

    def test_within_is_containedby_extend(self):
        # Intervals.java:417-420: within = containedBy(src, extend(ref, n, n))
        q = parse_interval_fn("fn:within(table 3 fn:or(hash merge))")
        assert q.source == IContainedBy(
            ITerm("table"), IExtend(IOr((ITerm("hash"), ITerm("merge"))), 3, 3)
        )

    def test_atleast_expansion(self):
        q = parse_interval_fn("fn:atleast(2 a b c)")
        assert q.source == IOr(
            (
                IUnordered((ITerm("a"), ITerm("b"))),
                IUnordered((ITerm("a"), ITerm("c"))),
                IUnordered((ITerm("b"), ITerm("c"))),
            )
        )
        assert parse_interval_fn("fn:atleast(3 a b c)").source == IUnordered(
            (ITerm("a"), ITerm("b"), ITerm("c"))
        )
        assert parse_interval_fn("fn:atleast(1 a b)").source == IOr(
            (ITerm("a"), ITerm("b"))
        )
        # m > n matches nothing (NoMatchIntervalsSource role)
        assert parse_interval_fn("fn:atleast(4 a b c)").source == IOr(())

    def test_unordered_no_overlaps_identity(self):
        # Intervals.java:354: or(ordered(a, b), ordered(b, a))
        q = parse_interval_fn("fn:unorderedNoOverlaps(a b)")
        assert q.source == IOr(
            (IOrdered((ITerm("a"), ITerm("b"))), IOrdered((ITerm("b"), ITerm("a"))))
        )

    def test_maxwidth_extend_numbers(self):
        assert parse_interval_fn("fn:maxwidth(3 x)").source == IMaxWidth(3, ITerm("x"))
        assert parse_interval_fn("fn:extend(x 1 2)").source == IExtend(ITerm("x"), 1, 2)

    @pytest.mark.parametrize(
        "bad",
        [
            "fn:bogus(a)",
            "fn:ordered(a) trailing",
            "fn:maxgaps(x a)",
            "fn:ordered()",
            "fn:before(a)",
            "fn:within(a b c)",
            "plain text",
        ],
    )
    def test_errors(self, bad):
        with pytest.raises(ValueError):
            parse_interval_fn(bad)

    def test_wildcard_needs_index(self):
        with pytest.raises(ValueError, match="needs an index"):
            parse_interval_fn("fn:wildcard(ab*)")


def _rand_positions(rng, vocab, n=18):
    pos = {t: [] for t in vocab}
    for p in range(n):
        pos[rng.choice(vocab)].append(p)
    return lambda t: np.array(pos.get(t, []), dtype=np.int64)


def brute_atleast(m, sources, pos_of):
    """Definitional brute: minimal spans over combinations of intervals
    from m of the sources (Intervals.java:473)."""
    kids = [brute(s, pos_of) for s in sources]
    cands = []
    for subset in combinations(range(len(sources)), m):
        sel = [kids[i] for i in subset]
        if any(not k for k in sel):
            continue
        for combo in product(*sel):
            s = min(iv[0] for iv in combo)
            e = max(iv[1] for iv in combo)
            cands.append((s, e, sum(c for _, _, c in combo)))
    return brute_minimalize(cands)


class TestAtLeastSemantics:
    def test_fuzz_vs_definition(self):
        rng = random.Random(31)
        vocab = ["a", "b", "c", "d"]
        for _ in range(300):
            pos_of = _rand_positions(rng, vocab)
            n = rng.randint(2, 4)
            m = rng.randint(1, n)
            srcs = tuple(ITerm(t) for t in vocab[:n])
            got = [(s, e) for s, e, _ in eval_source(at_least(m, *srcs), pos_of)]
            want = [(s, e) for s, e, _ in brute_atleast(m, srcs, pos_of)]
            assert sorted(got) == sorted(want), (m, n)

    def test_nested_sources(self):
        rng = random.Random(77)
        vocab = ["a", "b", "c", "d"]
        for _ in range(100):
            pos_of = _rand_positions(rng, vocab, n=24)
            srcs = (
                IOrdered((ITerm("a"), ITerm("b"))),
                ITerm("c"),
                IUnordered((ITerm("d"), ITerm("a"))),
            )
            got = [(s, e) for s, e, _ in eval_source(at_least(2, *srcs), pos_of)]
            want = [(s, e) for s, e, _ in brute_atleast(2, srcs, pos_of)]
            assert sorted(got) == sorted(want)

    def test_no_overlaps_fuzz(self):
        rng = random.Random(13)
        vocab = ["a", "b", "c"]
        for _ in range(200):
            pos_of = _rand_positions(rng, vocab)
            a, b = ITerm("a"), IMaxGaps(2, IOrdered((ITerm("b"), ITerm("c"))))
            got = [(s, e) for s, e, _ in eval_source(unordered_no_overlaps(a, b), pos_of)]
            # definition: both present, not overlapping → one before the other
            ka, kb = brute(a, pos_of), brute(b, pos_of)
            cands = []
            for ia in ka:
                for ib in kb:
                    if ia[1] < ib[0] or ib[1] < ia[0]:
                        cands.append(
                            (min(ia[0], ib[0]), max(ia[1], ib[1]), ia[2] + ib[2])
                        )
            want = [(s, e) for s, e, _ in brute_minimalize(cands)]
            assert sorted(got) == sorted(want)


class TestEndToEnd:
    def test_parsed_equals_handbuilt(self, spark, search_index):
        s = Searcher(search_index)
        parsed = parse_interval_fn("fn:maxgaps(6 fn:unordered(return if))")
        built = A.IntervalQuery(IMaxGaps(6, IUnordered((ITerm("return"), ITerm("if")))))
        assert s.search(parsed, k=10).hits == s.search(built, k=10).hits

    def test_atleast_e2e_distributed(self, spark, search_index):
        s = Searcher(search_index)
        q = parse_interval_fn("fn:atleast(2 return if int)")
        drv = s.search(q, k=10).hits
        dist = s.search(q, k=10, mode="distributed").hits
        assert drv  # fixture corpus matches
        assert [(d, round(x, 5)) for d, x in drv] == [(d, round(x, 5)) for d, x in dist]

    def test_atleast_too_few_matches_nothing(self, spark, search_index):
        s = Searcher(search_index)
        q = parse_interval_fn("fn:atleast(4 return if int)")
        assert s.search(q, k=10).hits == []

    def test_wildcard_expansion(self, spark, search_index):
        s = Searcher(search_index)
        q = parse_interval_fn("fn:maxgaps(8 fn:ordered(fn:wildcard(ret*) if))",
                              index=search_index)
        src = q.source.source.sources[0]
        terms = {src.term} if isinstance(src, ITerm) else {t.term for t in src.sources}
        assert terms and all(t.startswith("ret") for t in terms)
        assert s.search(q, k=5).hits

    def test_fuzzyterm_expansion(self, spark, search_index):
        q = parse_interval_fn("fn:unordered(fn:fuzzyterm(retorn 1) if)",
                              index=search_index)
        src = q.source.sources[0]
        terms = {src.term} if isinstance(src, ITerm) else {t.term for t in src.sources}
        assert "return" in terms

    def test_wildcard_expansion_cap(self, spark, search_index):
        with pytest.raises(ValueError, match="expands to"):
            parse_interval_fn("fn:wildcard(r* 1)", index=search_index)

    def test_percall_cap_does_not_leak(self, spark, search_index):
        """A per-fn maxExpansions argument bounds THAT call only — the
        second wildcard keeps the parser-wide default cap."""
        q = parse_interval_fn(
            "fn:or(fn:wildcard(retur* 2) fn:wildcard(ret*))", index=search_index
        )
        assert q.source is not None

    def test_atleast_one_of_many_is_linear(self):
        # m == 1 is a plain IOr — no combinatorial cap applies
        src = at_least(1, *[ITerm(c) for c in "abcdefghij"])
        assert isinstance(src, IOr) and len(src.sources) == 10

    def test_field_scoped_terms_and_expansion(self, spark, search_index):
        """title:fn:... scopes bare terms AND wildcard expansion into
        the field's composite key space (span_term(field=) convention)."""
        from lucene_spark.index.builder import FIELD_SEP

        q = parse_interval_fn("somefield:fn:ordered(alpha beta)", index=search_index)
        terms = sorted({t.term for t in q.source.sources})
        assert terms == [f"somefield{FIELD_SEP}alpha", f"somefield{FIELD_SEP}beta"]
        # primary-field prefix leaves terms bare
        q2 = parse_interval_fn("content:fn:ordered(alpha beta)", index=search_index)
        assert sorted({t.term for t in q2.source.sources}) == ["alpha", "beta"]
