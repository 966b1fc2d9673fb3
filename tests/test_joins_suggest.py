"""Query-time join (lucene/join JoinUtil role) and suggesters
(lucene/suggest role) vs brute-force re-derivations."""

from __future__ import annotations

import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.joins import join_top_parents
from lucene_spark.search.suggest import complete_prefix, spell_suggest


def _ordered(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


class TestJoin:
    @pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
    def test_join_vs_brute(self, spark, search_index, corpus_pdf, oracle, mode):
        s = Searcher(search_index)
        docs_df = search_index.docs.select("doc_id", "lang")
        got = [
            (r["rank"], r["parent"], r["n_children"], round(r["score"], 4))
            for r in join_top_parents(s, A.TermQuery("return"), docs_df, "lang", mode, k=10).collect()
        ]
        ordered = _ordered(corpus_pdf)
        lang_of = {i: ordered.loc[i, "lang"] for i in range(len(ordered))}
        groups: dict[str, list[float]] = {}
        for d, sc in oracle.top_k(A.TermQuery("return"), k=10**9):
            groups.setdefault(lang_of[d], []).append(sc)
        agg = {
            "max": max,
            "total": sum,
            "avg": lambda v: sum(v) / len(v),
            "min": min,
        }[mode]
        want_rows = sorted(
            ((agg(v), p, len(v)) for p, v in groups.items()),
            key=lambda t: (-t[0], t[1]),
        )
        want = [(i + 1, p, n, round(sc, 4)) for i, (sc, p, n) in enumerate(want_rows)]
        # float32 engine vs float64 brute: compare scores at 4dp
        assert [(r, p, n) for r, p, n, _ in got] == [(r, p, n) for r, p, n, _ in want]
        for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
            assert abs(gs - ws) < 5e-3

    def test_score_mode_none_constant(self, spark, search_index):
        s = Searcher(search_index)
        docs_df = search_index.docs.select("doc_id", "lang")
        rows = join_top_parents(s, A.TermQuery("return"), docs_df, "lang", "none", k=10).collect()
        assert rows and all(r["score"] == 1.0 for r in rows)

    def test_bad_mode_raises(self, spark, search_index):
        s = Searcher(search_index)
        with pytest.raises(ValueError):
            join_top_parents(s, A.TermQuery("return"), search_index.docs, "lang", "sum")


class TestSuggest:
    def _brute_stats(self, corpus_pdf):
        ordered = _ordered(corpus_pdf)
        df: dict[str, int] = {}
        ttf: dict[str, int] = {}
        for i in range(len(ordered)):
            toks = tokenize(ordered.loc[i, "content"])
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
            for t in toks:
                ttf[t] = ttf.get(t, 0) + 1
        return df, ttf

    def test_prefix_completion_vs_brute(self, spark, search_index, corpus_pdf):
        _, ttf = self._brute_stats(corpus_pdf)
        got = [(r["term"], r["weight"]) for r in complete_prefix(search_index, "re", k=10).collect()]
        want = sorted(
            ((t, w) for t, w in ttf.items() if t.startswith("re")),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        assert got == want

    def test_prefix_no_match(self, spark, search_index):
        assert complete_prefix(search_index, "zzz_nope", k=10).count() == 0

    def test_spell_vs_brute(self, spark, search_index, corpus_pdf):
        df, _ = self._brute_stats(corpus_pdf)

        def lev(a: str, b: str) -> int:
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    cur = dp[j]
                    dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                    prev = cur
            return dp[-1]

        probe = "retur"
        got = [(r["term"], r["dist"], r["df"]) for r in spell_suggest(search_index, probe, k=5).collect()]
        cands = [(t, lev(probe, t), n) for t, n in df.items() if 0 < lev(probe, t) <= 2]
        want = sorted(cands, key=lambda c: (c[1], -c[2], c[0]))[:5]
        assert got == want

    def test_spell_excludes_exact(self, spark, search_index):
        rows = spell_suggest(search_index, "return", k=10).collect()
        assert all(r["term"] != "return" for r in rows)

    def test_infix_vs_brute(self, spark, corpus_pdf):
        # AnalyzingInfixSuggester: suggestions = paths, weight = doc len;
        # a lookup matches any token with the fragment as a prefix
        from lucene_spark.search.suggest import infix_suggest
        import re

        ordered = _ordered(corpus_pdf)
        sugg = spark.createDataFrame(
            [
                (ordered.loc[i, "path"], len(ordered.loc[i, "content"]))
                for i in range(len(ordered))
            ],
            "suggestion string, weight long",
        )
        got = [(r["suggestion"], r["weight"]) for r in infix_suggest(sugg, "re", k=10).collect()]
        want = sorted(
            (
                (ordered.loc[i, "path"], len(ordered.loc[i, "content"]))
                for i in range(len(ordered))
                if any(
                    t.startswith("re")
                    for t in re.findall("[a-z0-9]+", ordered.loc[i, "path"].lower())
                )
            ),
            key=lambda p: (-p[1], p[0]),
        )[:10]
        assert got == want

    def test_infix_matches_mid_text_token(self, spark):
        from lucene_spark.search.suggest import infix_suggest

        sugg = spark.createDataFrame(
            [("alpha beta gamma", 5), ("nothing here", 9), ("BETA first", 1)],
            "suggestion string, weight long",
        )
        got = [r["suggestion"] for r in infix_suggest(sugg, "bet", k=10).collect()]
        # matches mid-text and case-insensitively; ranked by weight desc
        assert got == ["alpha beta gamma", "BETA first"]
        # prefix-of-token only: 'eta' is infix of 'beta' but not a token prefix
        assert infix_suggest(sugg, "eta", k=10).count() == 0

    def test_infix_fragment_metachars_are_literal(self, spark):
        """LIKE/regex metacharacters in the user fragment must match
        literally — no [a-z0-9]+ token can contain % or _, so these
        lookups return nothing (they used to wildcard-match)."""
        from lucene_spark.search.suggest import infix_suggest

        sugg = spark.createDataFrame(
            [("100th street", 5), ("totally unrelated", 9)],
            "suggestion string, weight long",
        )
        assert infix_suggest(sugg, "100%", k=10).count() == 0
        assert infix_suggest(sugg, "tot_lly", k=10).count() == 0
        assert infix_suggest(sugg, "to'tal", k=10).count() == 0
        # plain fragments still match
        assert infix_suggest(sugg, "100", k=10).count() == 1


class TestMoreLikeThis:
    def test_interesting_terms_vs_brute(self, spark, search_index, corpus_pdf):
        import math

        from lucene_spark.search.mlt import interesting_terms

        ordered = _ordered(corpus_pdf)
        docs_df = spark.createDataFrame(
            [(i, ordered.loc[i, "content"]) for i in range(len(ordered))], "doc_id long, content string"
        )
        got = interesting_terms(search_index, 3, docs_df)

        toks = tokenize(ordered.loc[3, "content"])
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        df: dict[str, int] = {}
        for i in range(len(ordered)):
            for t in set(tokenize(ordered.loc[i, "content"])):
                df[t] = df.get(t, 0) + 1
        n = len(ordered)
        want = sorted(
            (
                (t, c * (math.log((n + 1) / (df[t] + 1)) + 1.0))
                for t, c in tf.items()
                if c >= 2 and df[t] >= 5
            ),
            key=lambda p: (-p[1], p[0]),
        )[:25]
        assert got == want

    def test_mlt_search_matches_expanded_query(self, spark, search_index, corpus_pdf, oracle):
        from lucene_spark.search.mlt import more_like_this, more_like_this_query

        ordered = _ordered(corpus_pdf)
        docs_df = spark.createDataFrame(
            [(i, ordered.loc[i, "content"]) for i in range(len(ordered))], "doc_id long, content string"
        )
        s = Searcher(search_index)
        q = more_like_this_query(search_index, 3, docs_df)
        got = more_like_this(s, 3, docs_df, k=10).hits
        want = oracle.top_k(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want]
        # source doc scores highest against its own terms
        assert got[0][0] == 3

    def test_mlt_missing_doc(self, spark, search_index):
        from lucene_spark.search.mlt import more_like_this

        s = Searcher(search_index)
        empty = spark.createDataFrame([], "doc_id long, content string")
        assert more_like_this(s, 99999, empty, k=10).hits == []


class TestCommonTerms:
    def test_split_and_score_vs_oracle(self, spark, search_index, oracle):
        from lucene_spark.search.commonterms import common_terms_query, search_common_terms
        from lucene_spark.testing.oracle import OracleIndex  # noqa: F401

        s = Searcher(search_index)
        # pick a genuinely rare term for the low bucket so the split is
        # (high: 'return', low: rare): cutoff halfway between their dfs
        n = search_index.stats.doc_count
        rare = s.index.term_stats_df.orderBy("df", "term").limit(1).collect()[0]
        terms = ("return", rare["term"])
        stats = search_index.term_stats(list(terms))
        cutoff_frac = (stats[rare["term"]][0] + 1) / n  # rare <= cutoff < return
        assert stats["return"][0] > cutoff_frac * n
        q = common_terms_query(search_index, terms, max_term_frequency=cutoff_frac)
        got = search_common_terms(s, terms, k=1000, max_term_frequency=cutoff_frac)
        want = oracle.top_k(q, 1000)
        assert [d for d, _ in got.hits] == [d for d, _ in want]
        # high-freq 'return' must not select on its own: matches ==
        # docs containing the low (rare) term
        assert got.total_hits == stats[rare["term"]][0]

    def test_all_low_or_all_high(self, spark, search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.commonterms import common_terms_query

        # cutoff above every df → everything low → plain disjunction
        q = common_terms_query(search_index, ("return", "int"), max_term_frequency=1e9)
        assert isinstance(q, A.BooleanQuery)
        assert all(occ == A.Occur.SHOULD for occ, _ in q.clauses)
        # absolute cutoff 1: everything with df>1 is high
        q2 = common_terms_query(search_index, ("return", "int"), max_term_frequency=1.0)
        assert isinstance(q2, A.BooleanQuery)


class TestFuzzySuggest:
    """FuzzySuggester: prefix completion within an edit budget."""

    def test_matches_brute(self, search_index):
        from lucene_spark.search.suggest import fuzzy_suggest

        stats = {
            r["term"]: int(r["ttf"])
            for r in search_index.term_stats_df.select("term", "ttf").collect()
        }

        def lev(a, b):
            import numpy as np

            d = np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
            return int(d[len(b)])

        typed = "retvrn"  # typo for 'return'
        want = sorted(
            (
                (t, w)
                for t, w in stats.items()
                if t.startswith(typed[:1])
                and min(
                    lev(typed, t[:L])
                    for L in range(max(1, len(typed) - 1), len(typed) + 2)
                )
                <= 1
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        got = [(r["term"], r["weight"]) for r in fuzzy_suggest(search_index, typed).collect()]
        assert got == want
        assert any(t == "return" for t, _ in got)

    def test_short_input_is_exact_prefix(self, search_index):
        from lucene_spark.search.suggest import complete_prefix, fuzzy_suggest

        got = [(r["term"], r["weight"]) for r in fuzzy_suggest(search_index, "re").collect()]
        want = [(r["term"], r["weight"]) for r in complete_prefix(search_index, "re").collect()]
        assert got == want
