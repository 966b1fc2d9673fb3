"""TermAutomatonQuery — builder/finish validation, rewrite parity, and
the countMatches state walk vs an independent DFS path-count brute.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java (builder surface :99-135, finish() ANY
expansion + rejections, rewrite :430-520) and TermAutomatonScorer.java
(countMatches :222-345: freq counts accept arrivals via term arcs and
initial seeds only; ANY advances state but never accepts; matches
cannot start with ANY).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.codec.smallfloat import int_to_byte4_np
from lucene_spark.search import ast as A
from lucene_spark.search.automaton import (
    TermAutomatonBuilder,
    automaton_freq,
    token_stream_to_automaton,
    try_rewrite,
)
from lucene_spark.search.engine import Searcher
from lucene_spark.search.similarity import BM25Stats, idf, score_freqs


def brute_freq(toks, term_sym, table, accepts, any_sym):
    """Independent from-definition path count: a match starts at a
    query-term token seeding state 0 and extends one position at a
    time. At EVERY position a live path branches BOTH ways: the term
    step (when the token is a query term) AND the any-symbol step —
    the reference's ANY sweep starts AT lastPos (TermAutomatonScorer
    countMatches :268 startLastPos), so the states a token stepped via
    its term symbol are ALSO any-stepped when the next token arrives,
    and PosState.add never dedups; a dist-2 span whose gap token is a
    query term therefore yields two distinct accept arrivals. Accept
    arrivals count on term arcs and seeds, never on ANY."""
    freq = 0
    n = len(toks)

    def extend(pos, state):
        nonlocal freq
        if pos >= n:
            return
        sym = term_sym.get(toks[pos])
        if sym is not None:
            d = table.get((state, sym))
            if d is not None:
                if d in accepts:
                    freq += 1
                extend(pos + 1, d)
        if any_sym is not None:
            d = table.get((state, any_sym))
            if d is not None:
                extend(pos + 1, d)

    for p in range(n):
        sym = term_sym.get(toks[p])
        if sym is None:
            continue
        d = table.get((0, sym))
        if d is not None:
            if d in accepts:
                freq += 1
            extend(p + 1, d)
    return freq


def _run(dfa, toks):
    term_sym = {t: i for i, t in enumerate(dfa.terms) if t is not None}
    table = dfa.step_table()
    stream = sorted(
        (p, term_sym[t]) for p, t in enumerate(toks) if t in term_sym
    )
    got = automaton_freq(stream, table, frozenset(dfa.accepts), dfa.any_sym)
    want = brute_freq(toks, term_sym, table, set(dfa.accepts), dfa.any_sym)
    return got, want


def _phrase_any_dfa():
    """0 -a-> 1 -b-> 2(acc); 1 -ANY-> 3 -b-> 2(acc): "a b" or "a ? b"."""
    b = TermAutomatonBuilder()
    s1, s2, s3 = b.create_state(), b.create_state(), b.create_state()
    b.set_accept(s2)
    b.add_transition(0, s1, "a")
    b.add_transition(s1, s2, "b")
    b.add_any_transition(s1, s3)
    b.add_transition(s3, s2, "b")
    return b.finish()


class TestBuilderContracts:
    def test_leading_any_rejected(self):
        b = TermAutomatonBuilder()
        s1 = b.create_state()
        b.set_accept(s1)
        b.add_any_transition(0, s1)
        with pytest.raises(ValueError, match="lead with an ANY"):
            b.finish()

    def test_trailing_any_rejected(self):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "x")
        b.add_any_transition(s1, s2)
        with pytest.raises(ValueError, match="end with an ANY"):
            b.finish()

    def test_empty_string_rejected(self):
        b = TermAutomatonBuilder()
        b.set_accept(0)
        b.add_transition(0, 0, "x")
        with pytest.raises(ValueError, match="empty string"):
            b.finish()

    def test_any_expansion_merges_into_term_step(self):
        # after finish(), step on 'b' from s1 subsumes the ANY arc
        # (finish() expands ANY over the whole alphabet, det merges) —
        # AND the scorer's sweep supplies a separate any-symbol step
        # from the same source states, so the dist-2 span whose gap is
        # the query term 'b' arrives twice: "a b"(adj) + "a ? b" with
        # ?=b via det term step + "a ? b" via the any-symbol sweep.
        dfa = _phrase_any_dfa()
        got, want = _run(dfa, ["a", "b", "b"])
        assert got == want == 3


class TestRewriteParity:
    def test_singleton_term(self):
        b = TermAutomatonBuilder()
        s1 = b.create_state()
        b.set_accept(s1)
        b.add_transition(0, s1, "table")
        assert try_rewrite(b.finish()) == A.TermQuery("table")

    def test_chain_phrase(self):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "table")
        b.add_transition(s1, s2, "hash")
        assert try_rewrite(b.finish()) == A.PhraseQuery(("table", "hash"))

    def test_sausage_multiphrase(self):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "table")
        b.add_transition(0, s1, "merge")
        b.add_transition(s1, s2, "hash")
        assert try_rewrite(b.finish()) == A.MultiPhraseQuery((("merge", "table"), ("hash",)))

    def test_any_keeps_automaton(self):
        assert try_rewrite(_phrase_any_dfa()) is None

    def test_branching_dests_keep_automaton(self):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s1)
        b.set_accept(s2)
        b.add_transition(0, s1, "x")
        b.add_transition(0, s2, "y")
        b.add_transition(s2, s1, "z")
        assert try_rewrite(b.finish()) is None


class TestCountMatchesVsBrute:
    def test_golden_any_gap(self):
        dfa = _phrase_any_dfa()
        for toks, expect in [
            (["a", "b"], 1),  # adjacent
            (["a", "x", "b"], 1),  # via ANY (hole gap: one path only)
            (["a", "b", "b"], 3),  # adj + term-gap dist-2 counted twice
            (["a", "a", "b"], 3),  # dist-2 twice (gap 'a') + adj "a b"
            (["a", "x", "b", "b"], None),  # brute-checked mixed shape
            (["b", "a"], 0),
            (["a", "x", "x", "b"], 0),  # gap 2 exceeds single ANY
        ]:
            got, want = _run(dfa, toks)
            assert got == want
            if expect is not None:
                assert got == expect

    def test_same_position_semantics_order_free(self):
        # two query terms can share a position on stacked indexes: both
        # step from the same source set whatever the pop order
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "a")
        b.add_transition(0, s1, "b")
        b.add_transition(s1, s2, "c")
        dfa = b.finish()
        term_sym = {t: i for i, t in enumerate(dfa.terms) if t is not None}
        table = dfa.step_table()
        stream = [(0, term_sym["a"]), (0, term_sym["b"]), (1, term_sym["c"])]
        f1 = automaton_freq(stream, table, frozenset(dfa.accepts), dfa.any_sym)
        f2 = automaton_freq(
            [stream[1], stream[0], stream[2]], table, frozenset(dfa.accepts), dfa.any_sym
        )
        assert f1 == f2 == 2  # "a c" and "b c" both arrive at accept

    def test_fuzz_vs_brute(self):
        rng = random.Random(5)
        vocab = ["a", "b", "c", "d"]
        for trial in range(400):
            nstates = rng.randint(2, 5)
            b = TermAutomatonBuilder()
            states = [0] + [b.create_state() for _ in range(nstates - 1)]
            b.set_accept(states[-1])
            if rng.random() < 0.5 and nstates > 2:
                b.set_accept(states[-2])
            n_arcs = rng.randint(2, 7)
            ok = True
            for _ in range(n_arcs):
                i = rng.randrange(nstates - 1)
                j = rng.randrange(i + 1, nstates)  # acyclic: bounded paths
                if rng.random() < 0.25 and states[i] != 0 and not (
                    states[j] in b._accept
                ):
                    b.add_any_transition(states[i], states[j])
                else:
                    b.add_transition(states[i], states[j], rng.choice(vocab))
            try:
                dfa = b.finish()
            except ValueError:
                continue  # rejected shape (empty-string accept etc.)
            if not dfa.steps:
                continue
            for _ in range(4):
                toks = [rng.choice(vocab + ["z", "w"]) for _ in range(rng.randint(1, 14))]
                got, want = _run(dfa, toks)
                assert got == want, (trial, toks, dfa)


def _brute_scores(corpus_texts, dfa, k):
    toks = {d: tokenize(t) for d, t in corpus_texts.items()}
    term_sym = {t: i for i, t in enumerate(dfa.terms) if t is not None}
    n_docs = len(toks)
    sum_ttf = sum(len(v) for v in toks.values())
    dfs = {
        t: sum(1 for v in toks.values() if t in v) for t in term_sym
    }
    present = sorted(t for t in term_sym if dfs[t] > 0)
    stats = BM25Stats(n_docs, sum_ttf)
    w = np.float32(0.0)
    for t in present:
        w = np.float32(w + idf(dfs[t], n_docs))
    cache = stats.cache()
    table = dfa.step_table()
    hits = []
    for d, v in toks.items():
        f = brute_freq(v, term_sym, table, set(dfa.accepts), dfa.any_sym)
        if f > 0:
            nb = int(int_to_byte4_np(np.array([len(v)]))[0])
            s = float(score_freqs(w, np.array([f], dtype=np.float32), np.array([nb]), cache)[0])
            hits.append((d, s))
    hits.sort(key=lambda h: (-h[1], h[0]))
    return hits[:k]


@pytest.fixture(scope="module")
def corpus_texts(corpus_pdf):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return {i: ordered.loc[i, "content"] for i in range(len(ordered))}


def _gap_dfa(t1, t2):
    """t1 t2 | t1 ? t2 (the classic one-ANY-gap proximity automaton)."""
    b = TermAutomatonBuilder()
    s1, s2, s3 = b.create_state(), b.create_state(), b.create_state()
    b.set_accept(s2)
    b.add_transition(0, s1, t1)
    b.add_transition(s1, s2, t2)
    b.add_any_transition(s1, s3)
    b.add_transition(s3, s2, t2)
    return b.finish()


class TestEngineE2E:
    def test_any_gap_vs_brute(self, search_index, corpus_texts):
        s = Searcher(search_index)
        dfa = _gap_dfa("return", "if")
        got = s.search(A.TermAutomatonQuery(dfa), k=10).hits
        want = _brute_scores(corpus_texts, dfa, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-6)

    def test_branching_accepts_vs_brute(self, search_index, corpus_texts):
        # "return if" OR "int" (two disjoint branches, different lengths)
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "return")
        b.add_transition(s1, s2, "if")
        b.add_transition(0, s2, "int")
        dfa = b.finish()
        assert try_rewrite(dfa) is None
        s = Searcher(search_index)
        got = s.search(A.TermAutomatonQuery(dfa), k=10).hits
        want = _brute_scores(corpus_texts, dfa, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, bb) in zip(got, want):
            assert a == pytest.approx(bb, rel=1e-6)

    def test_sausage_rewrites_to_phrase(self, search_index):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "return")
        b.add_transition(s1, s2, "if")
        s = Searcher(search_index)
        got = s.search(A.TermAutomatonQuery(b.finish()), k=10).hits
        want = s.search(A.PhraseQuery(("return", "if")), k=10).hits
        assert got == want

    def test_synonym_shape_rewrites(self, search_index):
        b = TermAutomatonBuilder()
        s1 = b.create_state()
        b.set_accept(s1)
        b.add_transition(0, s1, "return")
        b.add_transition(0, s1, "int")
        s = Searcher(search_index)
        got = s.search(A.TermAutomatonQuery(b.finish()), k=10).hits
        want = s.search(A.SynonymQuery(("return", "int")), k=10).hits
        assert got == want

    def test_distributed_twin(self, search_index):
        s = Searcher(search_index)
        q = A.TermAutomatonQuery(_gap_dfa("return", "if"))
        a = s.search(q, k=10, mode="driver").hits
        b = s.search(q, k=10, mode="distributed").hits
        assert a == b

    def test_absent_terms_drop(self, search_index):
        b = TermAutomatonBuilder()
        s1, s2 = b.create_state(), b.create_state()
        b.set_accept(s2)
        b.add_transition(0, s1, "zzznothere")
        b.add_transition(s1, s2, "if")
        s = Searcher(search_index)
        assert s.search(A.TermAutomatonQuery(b.finish()), k=5).hits == []


class TestTokenStreamToAutomaton:
    """TokenStreamToTermAutomatonQuery.toQuery
    (TokenStreamToTermAutomatonQuery.java:56-110): states = positions,
    '*' term = ANY arc, holes rejected, last state accepts."""

    def test_linear_stream_is_phrase(self):
        from lucene_spark.search.automaton import token_stream_to_automaton

        dfa = token_stream_to_automaton([("a", 1, 1), ("b", 1, 1), ("c", 1, 1)])
        assert try_rewrite(dfa) == A.PhraseQuery(("a", "b", "c"))

    def test_stacked_tokens_are_multiphrase(self):
        from lucene_spark.search.automaton import token_stream_to_automaton

        # posInc 0 stacks 'x' on 'a' (SynonymGraphFilter output shape)
        dfa = token_stream_to_automaton([("a", 1, 1), ("x", 0, 1), ("b", 1, 1)])
        assert try_rewrite(dfa) == A.MultiPhraseQuery((("a", "x"), ("b",)))

    def test_star_becomes_any(self):
        from lucene_spark.search.automaton import token_stream_to_automaton

        dfa = token_stream_to_automaton([("a", 1, 1), ("*", 1, 1), ("b", 1, 1)])
        assert dfa.any_sym is not None
        term_sym = {t: i for i, t in enumerate(dfa.terms) if t is not None}
        table = dfa.step_table()
        # "a x b" matches, "a b" does not (the ANY slot must consume one)
        assert brute_freq(["a", "x", "b"], term_sym, table, set(dfa.accepts), dfa.any_sym) == 1
        assert brute_freq(["a", "b"], term_sym, table, set(dfa.accepts), dfa.any_sym) == 0

    def test_pos_length_spans_states(self):
        from lucene_spark.search.automaton import token_stream_to_automaton

        # 'ab' spans two positions (posLength 2) — a graph token: the
        # automaton accepts "a b" OR "ab ANY"-less direct span... here
        # 'ab' consumes one TOKEN but two STATES, so "ab b"? No: it
        # accepts token 'ab' jumping 0->2 or tokens 'a','b' stepping
        # 0->1->2 (the SynonymGraphFilter multi-word synonym shape)
        dfa = token_stream_to_automaton(
            [("ab", 1, 2), ("a", 0, 1), ("b", 1, 1)]
        )
        term_sym = {t: i for i, t in enumerate(dfa.terms) if t is not None}
        table = dfa.step_table()
        assert brute_freq(["ab"], term_sym, table, set(dfa.accepts), dfa.any_sym) == 1
        assert brute_freq(["a", "b"], term_sym, table, set(dfa.accepts), dfa.any_sym) == 1
        assert brute_freq(["a"], term_sym, table, set(dfa.accepts), dfa.any_sym) == 0

    def test_holes_rejected(self):
        from lucene_spark.search.automaton import token_stream_to_automaton

        with pytest.raises(ValueError, match="holes"):
            token_stream_to_automaton([("a", 1, 1), ("b", 2, 1)])


class TestReferenceGoldens:
    """Engine-level mirrors of the reference's public
    TestTermAutomatonQuery cases (match SETS, the reference's
    totalHits assertions): testBasicSlop (:144-178),
    testPosLengthAtQueryTimeMock (:185-234), testAnyFromTokenStream
    (:345-380)."""

    def _index(self, spark, tmp_path_factory, texts):
        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex

        df = spark.createDataFrame(
            [(i, "o/r", f"p{i}", "c", "en", t) for i, t in enumerate(texts)],
            "doc_id long, repo string, path string, commit string, lang string, content string",
        )
        d = str(tmp_path_factory.mktemp("taq"))
        IndexBuilder(spark, IndexConfig(docs_per_chunk=4, term_buckets=2)).build(
            df, d, assign_ids=False
        )
        return SearchIndex(spark, d)

    def test_basic_slop(self, spark, tmp_path_factory):
        from lucene_spark.search.engine import Searcher

        ix = self._index(
            spark,
            tmp_path_factory,
            ["here comes the sun", "here comes sun", "here comes the other sun"],
        )
        b = TermAutomatonBuilder()
        s1, s2, s3 = b.create_state(), b.create_state(), b.create_state()
        b.add_transition(0, s1, "comes")
        b.add_any_transition(s1, s2)
        b.set_accept(s3)
        b.add_transition(s1, s3, "sun")
        b.add_transition(s2, s3, "sun")
        td = Searcher(ix).search(A.TermAutomatonQuery(b.finish()), k=10)
        assert {d for d, _ in td.hits} == {0, 1} and td.total_hits == 2

    def test_pos_length_at_query_time(self, spark, tmp_path_factory):
        from lucene_spark.search.engine import Searcher

        ix = self._index(
            spark,
            tmp_path_factory,
            [
                "speedy wifi network",
                "speedy wi fi network",
                "fast wifi network",
                "fast wi fi network",
                "slow wi fi network",
            ],
        )
        b = TermAutomatonBuilder()
        s1, s2, s3, s4 = (b.create_state() for _ in range(4))
        b.add_transition(0, s1, "fast")
        b.add_transition(0, s1, "speedy")
        b.add_transition(s1, s2, "wi")
        b.add_transition(s1, s3, "wifi")
        b.add_transition(s2, s3, "fi")
        b.add_transition(s3, s4, "network")
        b.set_accept(s4)
        td = Searcher(ix).search(A.TermAutomatonQuery(b.finish()), k=10)
        assert {d for d, _ in td.hits} == {0, 1, 2, 3} and td.total_hits == 4

    def test_any_from_token_stream(self, spark, tmp_path_factory):
        from lucene_spark.search.engine import Searcher

        ix = self._index(
            spark,
            tmp_path_factory,
            [
                "here comes the sun",
                "here comes the moon",
                "here comes sun",
                "here comes the other sun",
            ],
        )
        # CannedTokenStream: comes(1,1) comes(0,2) *(1,1) sun(1,1) moon(0,1)
        dfa = token_stream_to_automaton(
            [("comes", 1, 1), ("comes", 0, 2), ("*", 1, 1), ("sun", 1, 1), ("moon", 0, 1)]
        )
        td = Searcher(ix).search(A.TermAutomatonQuery(dfa), k=10)
        assert {d for d, _ in td.hits} == {0, 1, 2} and td.total_hits == 3
