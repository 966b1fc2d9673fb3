"""Query-time join (the lucene/join module's JoinUtil role).

The reference's ``JoinUtil.createJoinQuery(fromField, scoreMode, ...)``
(lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:66-120)
runs a "from" query, collects the join-field values of its matches with
their scores aggregated per value by ``ScoreMode``
(lucene/join/src/java/org/apache/lucene/search/join/ScoreMode.java:
None/Avg/Max/Total/Min), then scores "to"-side docs carrying those
values. ``ToParentBlockJoinQuery`` (ToParentBlockJoinQuery.java:52)
is the index-adjacent special case of the same aggregation.

Spark disposition: the child matches are a relation (doc_id, score);
the per-parent aggregation is a ``groupBy`` on the join column — a
single shuffle keyed on the parent key. Here the scored hit set comes
back from the searcher (driver or distributed mode) and is broadcast
into the docs-table join because top-level hit sets are small relative
to the corpus; at full 100 TB scale the same plan holds with the
scored matches left as a distributed DataFrame (the distributed
searcher's per-chunk scorer output), so the only shuffle is the
groupBy on the parent key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_MODES = ("max", "total", "avg", "min", "none")


def join_top_parents(
    searcher,
    child_query,
    docs_df: DataFrame,
    join_col: str,
    score_mode: str = "max",
    k: int = 10,
) -> DataFrame:
    """Top-k parent keys for a child query — JoinUtil.createJoinQuery
    with ScoreMode semantics. Every doc matching ``child_query`` is
    scored (exact BM25), grouped by ``docs_df[join_col]``; the group
    score is the ScoreMode aggregate of child scores:

      max   -> max(child scores)        (ScoreMode.Max)
      total -> sum(child scores)        (ScoreMode.Total)
      avg   -> mean(child scores)       (ScoreMode.Avg)
      min   -> min(child scores)        (ScoreMode.Min)
      none  -> 1.0 constant             (ScoreMode.None: score = boost)

    Returns (rank, parent, score, n_children) ordered by
    score desc, parent asc — the HitQueue tie-break lifted to keys.
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    matches = searcher.search(child_query, k=1_000_000_000)
    spark = docs_df.sparkSession
    hits = spark.createDataFrame(
        [(int(d), float(s)) for d, s in matches.hits], "doc_id bigint, score double"
    )
    agg = {
        "max": F.max("score"),
        "total": F.sum("score"),
        "avg": F.avg("score"),
        "min": F.min("score"),
        "none": F.lit(1.0),
    }[score_mode]
    grouped = (
        docs_df.join(F.broadcast(hits), "doc_id")
        .groupBy(F.col(join_col).alias("parent"))
        .agg(agg.alias("score"), F.count("*").alias("n_children"))
        .orderBy(F.desc("score"), F.asc("parent"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("parent"))
    return grouped.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "parent", "score", "n_children"
    )
