"""FunctionScoreQuery: rescore matches with an expression over the
relevance score and per-doc values.

Reference surface re-expressed Spark-first:
- lucene/queries/src/java/org/apache/lucene/queries/function/
  FunctionScoreQuery.java:38-74 — a Query whose score is a
  DoubleValuesSource evaluated per matching doc (static helpers
  boostByValue/boostByQuery multiply the wrapped query's score).
- lucene/expressions/src/java/org/apache/lucene/expressions/
  Expression.java:21-60 — compiled arithmetic expressions over the
  score and doc-value fields bound through SimpleBindings.

Here the DoubleValuesSource IS a Spark SQL expression string: the
wrapped query produces the full scored match set, the expression is
evaluated by Catalyst over (hit ⨝ docs-table) columns with the BM25
relevance exposed as `_score`, and the top-k re-rank is a
TakeOrderedAndProject (ORDER BY new score DESC LIMIT k). Everything
after the match phase is whole-stage-codegen JVM arithmetic — the
expression never runs in Python, which is exactly the
compiled-Expression contract of the reference module.

Scale shape: the only driver-side object is the scored hit-id array
(the same contract as facets/grouping — at cluster scale pass the
distributed hits relation instead; the join side with the docs table
stays a broadcast of hits either way, never a shuffle of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def function_score(
    searcher,
    query,
    expr: str,
    docs_df: DataFrame,
    k: int = 10,
    score_col: str = "_score",
    mode: str = "driver",
) -> DataFrame:
    """Rescore ``query``'s full match set with Spark SQL ``expr`` (may
    reference ``_score`` = the BM25 relevance and any docs-table
    column) and return the top-k rows ordered by the new score
    (FunctionScoreQuery.java:38-74; expression role of
    lucene/expressions Expression.java). Ties break by doc_id asc like
    TopScoreDocCollector (HitQueue.java:78-84).

    Returns (rank, doc_id, score) where score is the expression value.
    """
    from lucene_spark.search.postprocess import hits_frame

    hits = (
        hits_frame(searcher, query, mode)
        .withColumn(score_col, F.col("score").cast("double"))
        .select("doc_id", score_col)
    )
    joined = docs_df.join(F.broadcast(hits) if mode == "driver" else hits, "doc_id")
    rescored = (
        joined.withColumn("score", F.expr(expr).cast("double"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return rescored.select(
        w.cast("long").alias("rank"), F.col("doc_id").cast("long"), "score"
    )


def boost_by_value(
    searcher, query, value_col: str, docs_df: DataFrame, k: int = 10, mode: str = "driver"
) -> DataFrame:
    """FunctionScoreQuery.boostByValue role
    (FunctionScoreQuery.java:52-58): relevance × per-doc numeric
    field. ``mode`` passes through to :func:`function_score`
    ("distributed" keeps the match set off the driver)."""
    return function_score(searcher, query, f"_score * {value_col}", docs_df, k=k, mode=mode)


def boost_by_query(
    searcher, query, boost_query, boost_value: float, docs_df: DataFrame, k: int = 10,
    mode: str = "driver",
) -> DataFrame:
    """FunctionScoreQuery.boostByQuery role (FunctionScoreQuery.java:
    95-102 → QueryBoostValuesSource: boost = boostValue when the doc
    ALSO matches ``boost_query``, else 1; multiplied into the wrapped
    query's score). The boosting match set joins the scored hits as a
    doc-id relation (left join + conditional multiply — broadcast in
    driver mode, plain join at cluster scale), then TakeOrderedAndProject
    re-ranks. Returns (rank, doc_id, score)."""
    from lucene_spark.search.postprocess import hits_frame

    if boost_value < 0:
        raise ValueError(f"boost_value must be >= 0, got {boost_value}")
    hits = (
        hits_frame(searcher, query, mode)
        .withColumn("_score", F.col("score").cast("double"))
        .select("doc_id", "_score")
    )
    bset = hits_frame(searcher, boost_query, mode).select("doc_id").withColumn(
        "_boosted", F.lit(True)
    )
    joined = hits.join(F.broadcast(bset) if mode == "driver" else bset, "doc_id", "left")
    rescored = (
        joined.withColumn(
            "score",
            F.when(F.col("_boosted"), F.col("_score") * F.lit(float(boost_value))).otherwise(
                F.col("_score")
            ),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return rescored.select(
        w.cast("long").alias("rank"), F.col("doc_id").cast("long"), "score"
    )
