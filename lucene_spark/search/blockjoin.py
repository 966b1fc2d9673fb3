"""Index-adjacent (block) joins — the lucene/join module's other half.

The reference stores parent/child documents as contiguous blocks
(``IndexWriter.addDocuments``: children first, parent LAST) and joins
them at query time by doc-id adjacency instead of a key lookup:

* ``ToParentBlockJoinQuery``
  (lucene/join/src/java/org/apache/lucene/search/join/ToParentBlockJoinQuery.java:52)
  — a child query's matches are mapped to the NEXT parent doc id and
  aggregated per parent with a ``ScoreMode`` (None/Avg/Max/Total/Min).
* ``ToChildBlockJoinQuery`` (ToChildBlockJoinQuery.java:40) — a parent
  query's matches fan out to their children, each child inheriting the
  parent's score.
* ``ParentChildrenBlockJoinQuery`` (ParentChildrenBlockJoinQuery.java:43)
  — the children of ONE given parent that match a child query (the
  "expand" companion of ToParentBlockJoin).

Spark disposition.  The block structure is a doc-id order property, so
the child→parent mapping is "smallest parent doc id greater than the
child doc id".  Computing that naively needs either a global window
(single-partition shuffle — a 100 TB killer) or a range join.  We make
it scale with doc-id *bucketing*: parents are bucketed by
``doc_id // bucket_size``; a child resolves against (a) the parents of
its own bucket (bucket-keyed shuffle join, fan-out bounded by parents
per bucket) and (b) a per-bucket "next parent anywhere after this
bucket" fallback computed on the tiny distinct-bucket relation (one row
per bucket — the only place a single-partition window runs, over
``n_docs / bucket_size`` rows, driver-safe at any corpus size).  The
scored child matches come from ``Searcher.match_frame`` and stay a
DataFrame end-to-end; the per-parent aggregation is one shuffle keyed
on the parent id — the same shape as the reference's one pass over the
parent BitSet per segment.

Contract notes mirrored from the reference: a child query that matches
a parent doc is an error in Lucene (ToParentBlockJoinQuery.java checks
and throws); here parent-doc matches are EXCLUDED by construction (the
parent-flag anti-filter is part of the same join pass — checking
distributedly costs the join we already run).  Trailing docs after the
last parent cannot exist in a well-formed Lucene index (blocks end with
their parent); if present here they map to no parent and drop out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .joins import SCORE_MODES

def _score_agg(score_mode: str) -> Column:
    return {
        "max": F.max("score"),
        "total": F.sum("score"),
        "avg": F.avg("score"),
        "min": F.min("score"),
        "none": F.lit(1.0),  # ScoreMode.None: score = boost
    }[score_mode]


def _flag(parent_flag: str | Column) -> Column:
    return F.expr(parent_flag) if isinstance(parent_flag, str) else parent_flag


def parent_map(docs_df: DataFrame, parent_flag: str | Column, bucket_size: int = 4096) -> DataFrame:
    """(doc_id, parent_id) for every CHILD doc — the BitSet
    ``nextSetBit(doc)`` of ToParentBlockJoinQuery.java lifted to a
    relation.  ``parent_flag`` is a boolean expression over the docs
    table marking parent rows.  Orphans (docs after the last parent)
    are absent from the result; parent rows themselves are absent
    (a parent is not its own child)."""
    flag = _flag(parent_flag)
    parents = docs_df.filter(flag).select(F.col("doc_id").alias("p_id"))
    children = docs_df.filter(~flag).select("doc_id")
    b = lambda c: F.floor(c / F.lit(int(bucket_size)))  # noqa: E731

    pb = parents.withColumn("bucket", b(F.col("p_id")))
    # tiny relation: one row per doc-id bucket that contains any doc.
    doc_buckets = children.select(b(F.col("doc_id")).alias("bucket")).distinct()
    bucket_min = pb.groupBy("bucket").agg(F.min("p_id").alias("bmin"))
    from pyspark.sql import Window

    # next parent strictly AFTER this bucket: reversed running min over
    # the bucket relation (n_docs/bucket_size rows — the one
    # single-partition window, on deliberately tiny data).
    w = Window.orderBy("bucket").rowsBetween(1, Window.unboundedFollowing)
    nxt = (
        doc_buckets.join(bucket_min, "bucket", "full_outer")
        .withColumn("next_bmin", F.min("bmin").over(w))
        .select("bucket", "next_bmin")
    )
    # in-bucket candidate: min parent of the child's own bucket beyond it.
    in_bucket = (
        children.withColumn("bucket", b(F.col("doc_id")))
        .join(pb, "bucket", "left")
        .withColumn("p_id", F.when(F.col("p_id") > F.col("doc_id"), F.col("p_id")))
        .groupBy("doc_id", "bucket")
        .agg(F.min("p_id").alias("own"))
    )
    return (
        in_bucket.join(F.broadcast(nxt), "bucket", "left")
        .withColumn("parent_id", F.coalesce("own", "next_bmin"))
        .filter(F.col("parent_id").isNotNull())
        .select("doc_id", "parent_id")
    )


def to_parent_block_join(
    searcher,
    child_query,
    parent_flag: str | Column,
    score_mode: str = "avg",
    k: int = 10,
    bucket_size: int = 4096,
) -> DataFrame:
    """ToParentBlockJoinQuery: top-k parent docs for a child query.
    Child matches (full scored relation, distributed) are mapped to
    their block parent and aggregated by ``score_mode`` exactly as
    BlockJoinScorer.setScoreAndFreq does per parent bitset segment
    (ToParentBlockJoinQuery.java:210-240); ``none`` scores every
    parent 1.0 (ScoreMode.None → constant weight).  Returns
    (rank, parent_doc_id, score, n_children) with the HitQueue
    tie-break (score desc, doc id asc)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    docs = searcher.index.docs
    hits = searcher.match_frame(child_query)
    pmap = parent_map(docs, parent_flag, bucket_size)
    # the join against the child-only parent map IS the parent-hit
    # exclusion check (Lucene throws on child-query-matches-parent).
    scored = (
        hits.join(pmap, "doc_id")
        .groupBy(F.col("parent_id").alias("parent_doc_id"))
        .agg(_score_agg(score_mode).alias("score"), F.count("*").alias("n_children"))
        .orderBy(F.desc("score"), F.asc("parent_doc_id"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("parent_doc_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "parent_doc_id", "score", "n_children"
    )


def to_child_block_join(
    searcher,
    parent_query,
    parent_flag: str | Column,
    k: int = 10,
    bucket_size: int = 4096,
) -> DataFrame:
    """ToChildBlockJoinQuery: top-k CHILD docs for a parent query, each
    child carrying its parent's score (ToChildBlockJoinQuery.java:40 —
    "the child documents ... scored with the parent's score").  Parent
    matches are first restricted to parent-flagged rows (the query's
    doMatchJoinedChildren contract: the parent query must only match
    parents; non-parent matches are dropped rather than thrown).
    Returns (rank, doc_id, parent_doc_id, score)."""
    docs = searcher.index.docs
    flag = _flag(parent_flag)
    phits = searcher.match_frame(parent_query).join(
        docs.filter(flag).select("doc_id"), "doc_id"
    )
    pmap = parent_map(docs, parent_flag, bucket_size)
    joined = (
        pmap.join(
            phits.select(F.col("doc_id").alias("parent_id"), "score"),
            "parent_id",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", F.col("parent_id").alias("parent_doc_id"), "score")
    )


def parent_children(
    searcher,
    child_query,
    parent_doc_id: int,
    parent_flag: str | Column,
) -> DataFrame:
    """ParentChildrenBlockJoinQuery: the children of ONE parent that
    match ``child_query``, individually scored — the "expand" query
    (ParentChildrenBlockJoinQuery.java:43).  The block's child range
    is (previous parent, this parent) exclusive, resolved with one
    tiny aggregate (a point lookup, like the query's per-segment
    ``prevSetBit``); the range predicate then pushes down into the
    match relation.  Returns (doc_id, score) ordered by score desc,
    doc id asc."""
    docs = searcher.index.docs
    flag = _flag(parent_flag)
    prev = (
        docs.filter(flag & (F.col("doc_id") < F.lit(int(parent_doc_id))))
        .agg(F.max("doc_id"))
        .first()[0]
    )
    lo = -1 if prev is None else int(prev)
    return (
        searcher.match_frame(child_query)
        .filter((F.col("doc_id") > F.lit(lo)) & (F.col("doc_id") < F.lit(int(parent_doc_id))))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score")
    )
