"""ContextQuery / ContextSuggestField role — context-filtered prefix
completion with per-context boosts, prefix (non-exact) contexts, and
the all-contexts mode."""

from __future__ import annotations

import pytest

from lucene_spark.search.suggest import context_suggest


@pytest.fixture(scope="module")
def sugg_df(spark):
    rows = [
        ("table scan", 10, ["en", "src1"]),
        ("table hash", 20, ["de", "src10"]),
        ("table merge", 30, ["en", "de"]),
        ("tangent", 40, ["fr"]),
        ("vector", 50, ["en"]),          # prefix-mismatch
        ("tabular", 5, []),               # no contexts
        ("tab stop", 7, None),            # null contexts
    ]
    return spark.createDataFrame(
        rows, "suggestion string, weight long, contexts array<string>"
    )


class TestContextSuggest:
    def test_exact_context_filter_and_boost(self, sugg_df):
        got = context_suggest(sugg_df, "ta", {"en": 2.0}).collect()
        # en suggestions with 'ta' prefix: table scan(10*2), table merge(30*2)
        assert [(r["suggestion"], r["score"]) for r in got] == [
            ("table merge", 60.0),
            ("table scan", 20.0),
        ]

    def test_best_matching_context_wins(self, sugg_df):
        # 'table merge' carries en AND de — the best-scoring path wins
        got = context_suggest(sugg_df, "table", {"en": 1.0, "de": 3.0}).collect()
        scores = {r["suggestion"]: r["score"] for r in got}
        assert scores["table merge"] == 90.0  # max(1, 3) * 30
        assert scores["table hash"] == 60.0
        assert scores["table scan"] == 10.0

    def test_prefix_context(self, sugg_df):
        # non-exact context 'src1' matches stored contexts src1 AND src10
        got = context_suggest(sugg_df, "table", [("src1", 1.5, False)]).collect()
        assert {r["suggestion"] for r in got} == {"table scan", "table hash"}
        assert all(r["score"] == pytest.approx(r["suggestion"] == "table hash" and 30.0 or 15.0) for r in got)

    def test_exact_context_does_not_prefix_match(self, sugg_df):
        got = context_suggest(sugg_df, "table", {"src1": 1.0}).collect()
        assert [r["suggestion"] for r in got] == ["table scan"]  # not src10

    def test_match_all(self, sugg_df):
        got = context_suggest(sugg_df, "ta", match_all=True).collect()
        # every 'ta' suggestion with >= 1 context, score = weight
        assert [(r["suggestion"], r["score"]) for r in got] == [
            ("tangent", 40.0),
            ("table merge", 30.0),
            ("table hash", 20.0),
            ("table scan", 10.0),
        ]

    def test_no_contexts_error(self, sugg_df):
        with pytest.raises(ValueError, match="needs contexts"):
            context_suggest(sugg_df, "ta")
        with pytest.raises(ValueError, match="boost must be >= 0"):
            context_suggest(sugg_df, "ta", {"en": -1.0})

    def test_tie_break_by_suggestion(self, spark):
        df = spark.createDataFrame(
            [("b same", 10, ["x"]), ("a same", 10, ["x"])],
            "suggestion string, weight long, contexts array<string>",
        )
        got = context_suggest(df, "", {"x": 1.0}).collect()
        assert [r["suggestion"] for r in got] == ["a same", "b same"]
