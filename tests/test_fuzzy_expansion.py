"""Fuzzy transpositions=true expansion must not be dictionary-order
biased: the exact OSA check runs INSIDE the scan, so ``limit`` applies
to true OSA matches, not to a lexicographic slice of the wider
classic<=2k pre-filter pool (FuzzyQuery's automaton enumeration visits
every dictionary term — MultiTermQuery.java:55-93 — so a late-sorting
match like 'zaaa' is as reachable as an early one)."""

import itertools

import pytest


@pytest.fixture(scope="module")
def big_dict_index(spark, tmp_path_factory):
    """One doc whose dictionary holds >8192 decoy terms at classic
    distance 4 (= the transpositions pre-filter bound for max_edits=2)
    but OSA distance 4, plus two true OSA matches sorting LAST."""
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    alpha = "bcdefghijklmnopqrstuvwxy"  # no 'a', no 'z'
    decoys = [
        "".join(p)
        for p in itertools.islice(itertools.product(alpha, repeat=4), 8500)
    ]
    content = " ".join(decoys + ["aaaa", "zaaa", "zzaa"])
    df = spark.createDataFrame(
        [("org/r", "src/f.py", "c0", "py", content)],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path_factory.mktemp("fuzzybig"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4)).build(df, d)
    return SearchIndex(spark, d)


class TestFuzzyTranspositionsExpansion:
    def test_late_sorting_osa_matches_survive(self, big_dict_index):
        got = big_dict_index.expand_terms("fuzzy", ("aaaa", 2, 0, True), limit=64)
        # every decoy is 4 substitutions away (no shared letters with
        # 'aaaa'), so the ONLY OSA<=2 terms are the three seeded ones
        assert got == ["aaaa", "zaaa", "zzaa"]

    def test_limit_counts_osa_matches_not_pool(self, big_dict_index):
        # limit=2 must return the first two TRUE matches in term order,
        # not run out of budget on the 8500-decoy pre-filter pool
        got = big_dict_index.expand_terms("fuzzy", ("aaaa", 2, 0, True), limit=2)
        assert got == ["aaaa", "zaaa"]

    def test_classic_pool_really_exceeds_old_cap(self, big_dict_index):
        # guard: the scenario genuinely covers >8192 classic<=4
        # candidates, the regime where a capped collect-then-filter
        # drops late-sorting matches
        pool = big_dict_index.expand_terms("fuzzy", ("aaaa", 4, 0), limit=10**6)
        assert len(pool) > 8192
