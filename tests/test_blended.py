"""BlendedTermQuery (CORE/search/BlendedTermQuery.java): artificial
df = max(docFreqs), ttf = sum(totalTermFreqs), each term scored as a
TermQuery with the blended stats, combined by DisjunctionMax(0.01)
(default) or a SHOULD BooleanQuery."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


def _df(searcher, term):
    return searcher.index.term_stats([term]).get(term, (0, 0))[0]


class TestBlended:
    def test_vs_brute(self, spark, search_index, oracle):
        s = Searcher(search_index)
        terms = ("return", "if")
        q = A.BlendedTermQuery(terms)
        td = s.search(q, k=10)
        # brute: per-term BM25 with df = max of the two, dismax 0.01
        stats = s.index.stats
        n = stats.doc_count
        gdf = max(_df(s, t) for t in terms)
        w = math.log(1 + (n - gdf + 0.5) / (gdf + 0.5))
        import pyspark.sql.functions as F

        want = {}
        for t in terms:
            pl = s.index.collect_postings([t])[t]
            from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE

            avgdl = stats.sum_total_term_freq / n
            for d, tf, nm in zip(pl.docs, pl.tfs, pl.norms):
                dlen = NORM_LENGTH_TABLE[int(nm)]
                sc = w - w / (1 + int(tf) * (1.0 / (1.2 * ((1 - 0.75) + 0.75 * dlen / avgdl))))
                want.setdefault(int(d), []).append(sc)
        scored = {
            d: max(v) + 0.01 * (sum(v) - max(v)) for d, v in want.items()
        }
        top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [d for d, _ in td.hits] == [d for d, _ in top]
        for (d, got), (_, exp) in zip(td.hits, top):
            assert abs(got - exp) < 1e-4

    def test_equal_df_equals_plain_dismax(self, spark, search_index):
        """two terms with equal df: blending is a no-op, so the result
        equals a plain DisjunctionMax of TermQueries at the same tie."""
        s = Searcher(search_index)
        from collections import defaultdict

        # find two terms with identical df via the term_stats table
        rows = (
            s.index.term_stats_df.select("term", "df")
            .filter("df > 3 AND df < 150 AND term NOT LIKE '%\x1f%'")
            .limit(500)
            .collect()
        )
        by_df = defaultdict(list)
        for r in rows:
            by_df[r["df"]].append(r["term"])
        pair = next((v[:2] for v in by_df.values() if len(v) >= 2), None)
        if pair is None:
            pytest.skip("no equal-df term pair in fixture")
        a = s.search(A.BlendedTermQuery(tuple(pair), tie_breaker=0.3), k=10)
        b = s.search(
            A.DisjunctionMaxQuery(tuple(A.TermQuery(t) for t in pair), tie_breaker=0.3), k=10
        )
        assert a.hits == b.hits

    def test_boolean_rewrite_sums(self, spark, search_index):
        s = Searcher(search_index)
        q = A.BlendedTermQuery(("return", "if"), boolean_rewrite=True)
        td = s.search(q, k=10**6)
        dm = s.search(A.BlendedTermQuery(("return", "if"), tie_breaker=1.0), k=10**6)
        # tie=1.0 dismax == sum == boolean rewrite
        assert sorted((d, round(sc, 5)) for d, sc in td.hits) == sorted(
            (d, round(sc, 5)) for d, sc in dm.hits
        )

    def test_boosts_and_missing_terms(self, spark, search_index):
        s = Searcher(search_index)
        td = s.search(A.BlendedTermQuery(("return", "zzzznotaterm")), k=5)
        plain = s.search(A.TermQuery("return"), k=5)
        # blended df = df(return); single survivor scores like the term
        assert [d for d, _ in td.hits] == [d for d, _ in plain.hits]
        boosted = s.search(A.BlendedTermQuery(("return",), boosts=(2.0,)), k=5)
        for (d1, s1), (d2, s2) in zip(boosted.hits, plain.hits):
            assert d1 == d2 and abs(s1 - 2 * s2) < 1e-5


class TestFuzzyBlendedRewrite:
    """FuzzyQuery(rewrite="blended_freq") = the reference's default
    TopTermsBlendedFreqScoringRewrite (FuzzyQuery.java:59-62,
    MultiTermQuery.java:163-200): expansions become a boolean-rewrite
    BlendedTermQuery with boost 1.0 (exact) else 1 - ed/min(|cand|,
    |term|) (FuzzyTermsEnum.java:247-255)."""

    def test_vs_composed_blended(self, spark, search_index):
        from lucene_spark.testing.oracle import levenshtein

        s = Searcher(search_index)
        term, max_edits = "retur", 2
        got = s.search(A.FuzzyQuery(term, max_edits=max_edits, rewrite="blended_freq"), k=10)
        # compose the expected BlendedTermQuery by hand
        vocab = [r["term"] for r in s.index.term_stats_df.select("term").collect()]
        scored = []
        for t in vocab:
            if abs(len(t) - len(term)) > max_edits:
                continue
            ed = levenshtein(t, term, max_edits)
            if ed > max_edits:
                continue
            b = 1.0 if ed == 0 else 1.0 - ed / min(len(t), len(term))
            scored.append((t, float(np.float32(b))))
        scored.sort(key=lambda x: (-x[1], x[0]))
        assert scored, "fixture corpus must contain fuzzy expansions of 'retur'"
        want = s.search(
            A.BlendedTermQuery(
                tuple(t for t, _ in scored), tuple(b for _, b in scored), boolean_rewrite=True
            ),
            k=10,
        )
        assert got.hits == want.hits

    def test_constant_default_unchanged(self, spark, search_index):
        s = Searcher(search_index)
        td = s.search(A.FuzzyQuery("retur", max_edits=2), k=10)
        assert all(sc == 1.0 for _, sc in td.hits)

    def test_max_expansions_cut(self, spark, search_index):
        s = Searcher(search_index)
        full = s.search(A.FuzzyQuery("retur", max_edits=2, rewrite="blended_freq"), k=300)
        one = s.search(
            A.FuzzyQuery("retur", max_edits=2, rewrite="blended_freq", max_expansions=1), k=300
        )
        # the single kept expansion is the top-boost one -> fewer docs
        assert one.total_hits <= full.total_hits
