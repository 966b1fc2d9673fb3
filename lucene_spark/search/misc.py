"""Sandbox / misc-module operators: phrase-with-wildcards, diversified
top-k, and doc-values stats over a match set.

* ``PhraseWildcardQuery``
  (lucene/sandbox/src/java/org/apache/lucene/sandbox/search/PhraseWildcardQuery.java:60-95)
  — a phrase where any slot may be a wildcard/prefix pattern; the
  reference expands each multi-term slot against the term dictionary
  (segment-sharing TermsEnum) and matches like a MultiPhraseQuery.
  Here each pattern slot expands through the index's sorted term
  dictionary (``expand_terms``, the same pushed-down scan every
  multi-term query uses) and the result IS a MultiPhraseQuery — the
  engine's union-postings phrase kernel does the rest.
* ``DiversifiedTopDocsCollector``
  (lucene/misc/src/java/org/apache/lucene/misc/search/DiversifiedTopDocsCollector.java:39-70)
  — top-k with at most ``max_per_key`` hits per key (the "Madonna
  problem"): per-key ranking then the global cut.
* ``DocValuesStats`` (lucene/misc/src/java/org/apache/lucene/misc/
  search/DocValuesStats.java + DocValuesStatsCollector.java) —
  count/missing/min/max/sum/mean/variance of a doc-values column over
  the docs matching a query.

Spark disposition: all three stay DataFrame-shaped end-to-end.  The
diversified collector is a window rank per key over the distributed
match relation followed by TakeOrderedAndProject (the window
partitions by key, so it shuffles once on the key — never a global
sort); stats are one aggregate over the match-joined docs table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.search import ast as A


def phrase_wildcard(index, slots, slop: int = 0, max_expansions: int = 128) -> A.Query:
    """Build the PhraseWildcardQuery: ``slots`` is a sequence of
    strings; a slot containing ``*`` or ``?`` expands against the term
    dictionary (capped at ``max_expansions``, the reference's
    maxMultiTermExpansions), a bare slot is a literal analyzed term.
    Returns a MultiPhraseQuery (or the degenerate exact PhraseQuery);
    a slot with zero expansions makes the whole phrase unmatchable
    (MatchNoDocsQuery), mirroring PhraseWildcardQuery's empty-slot
    early exit."""
    from lucene_spark.analysis import tokenize

    positions: list[tuple[str, ...]] = []
    for slot in slots:
        if "*" in slot or "?" in slot:
            terms = tuple(index.expand_wildcard(slot.lower(), limit=max_expansions))
            if not terms:
                return A.MatchNoDocsQuery(f"phrase slot {slot!r} expands to nothing")
            positions.append(terms)
        else:
            toks = tokenize(slot)  # a multi-token literal contributes one slot per token
            if not toks:
                return A.MatchNoDocsQuery(f"phrase slot {slot!r} analyzes to nothing")
            positions.extend((t,) for t in toks)
    if all(len(p) == 1 for p in positions):
        return A.PhraseQuery(tuple(p[0] for p in positions), slop=slop)
    return A.MultiPhraseQuery(tuple(positions), slop=slop)


def diversified_top_k(
    searcher, query, key_col: str, max_per_key: int, k: int = 10
) -> DataFrame:
    """DiversifiedTopDocsCollector: global top-k keeping at most
    ``max_per_key`` hits per value of ``key_col``.  Per-key rank by
    (score desc, doc id asc) — the collector's key-deduped priority
    queue — then the global cut with the HitQueue tie-break.  Returns
    (rank, doc_id, key, score)."""
    from pyspark.sql import Window

    if max_per_key < 1:
        raise ValueError("max_per_key must be >= 1")
    hits = searcher.match_frame(query)
    keyed = hits.join(searcher.index.docs.select("doc_id", F.col(key_col).alias("key")), "doc_id")
    per_key = Window.partitionBy("key").orderBy(F.desc("score"), F.asc("doc_id"))
    kept = (
        keyed.withColumn("krank", F.row_number().over(per_key))
        .filter(F.col("krank") <= max_per_key)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return kept.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "key", "score"
    )


def doc_values_stats(searcher, query, value_col: str) -> DataFrame:
    """DocValuesStats over ``value_col`` for the docs matching
    ``query``: one row (count, missing, vmin, vmax, vsum, mean,
    variance) — the numeric DocValuesStats accumulation
    (DocValuesStats.java:30-90: count counts docs WITH a value,
    missing counts matched docs without; population variance)."""
    hits = searcher.match_frame(query).select("doc_id")
    # value_col may be any numeric SQL expression over the docs table
    # (LongValuesSource generality)
    vals = hits.join(searcher.index.docs.select("doc_id", F.expr(value_col).alias("v")), "doc_id")
    return vals.agg(
        F.count("v").alias("count"),
        (F.count("*") - F.count("v")).alias("missing"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("v").alias("vsum"),
        F.avg("v").alias("mean"),
        F.coalesce(F.var_pop("v"), F.lit(0.0)).alias("variance"),
    )
