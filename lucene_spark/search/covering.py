"""CoveringQuery — per-document minimum-should-match.

The reference's ``CoveringQuery``
(lucene/queries/src/java/org/apache/lucene/search/CoveringQuery.java:44)
generalizes BooleanQuery's ``minimumNumberShouldMatch`` to a per-doc
value read from a ``LongValuesSource``: a document matches when at
least ``minimumNumberMatch(doc)`` of the sub-queries match it, and its
score is the SUM of the matching sub-queries' scores (CoveringScorer's
sum over matching sub-scorers).  A doc must still match >= 1 clause to
be a candidate, so values below 1 behave as 1 (the scorer is driven by
the disjunction, exactly as in the reference).

Spark disposition: each sub-query's full scored match relation comes
from ``Searcher.match_frame`` (distributed, nothing on the driver);
the per-doc (sum, count) is one groupBy on doc_id; the per-doc
threshold is a Catalyst expression over the docs table joined on the
same key.  Two shuffles total regardless of corpus size, both keyed on
doc_id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def covering_frame(searcher, queries, min_match: str | Column) -> DataFrame:
    """Full match relation (doc_id, score, n_matched) of
    CoveringQuery(queries, min_match).  ``min_match`` is a long-valued
    expression over the docs table (the LongValuesSource); null values
    exclude the doc (LongValues.advanceExact false → no match)."""
    if not queries:
        raise ValueError("CoveringQuery requires at least one sub-query")
    mm = F.expr(min_match) if isinstance(min_match, str) else min_match
    frames = [searcher.match_frame(q) for q in queries]
    union = reduce(DataFrame.unionByName, frames)
    per_doc = union.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("n_matched")
    )
    thresholds = searcher.index.docs.select(
        "doc_id", mm.cast("long").alias("mm_raw")
    ).filter(F.col("mm_raw").isNotNull()).select(
        "doc_id", F.greatest(F.col("mm_raw"), F.lit(1)).alias("mm")
    )
    return (
        per_doc.join(thresholds, "doc_id")
        .filter(F.col("n_matched") >= F.col("mm"))
        .select("doc_id", "score", "n_matched")
    )


def covering_top_k(searcher, queries, min_match: str | Column, k: int = 10) -> DataFrame:
    """Top-k CoveringQuery hits with the HitQueue tie-break.  Returns
    (rank, doc_id, score, n_matched)."""
    from pyspark.sql import Window

    top = covering_frame(searcher, queries, min_match).orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score", "n_matched"
    )
