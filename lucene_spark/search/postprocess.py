"""Hit post-processing: facets + highlighting.

The reference treats these as separate modules (lucene/facet,
lucene/highlighter); SURVEY §2.5 maps them to aggregation / string ops
over the hits relation — which is exactly what they are here:

- facets = match the query (constant-score doc set), join the docs
  table, groupBy the facet column. Pure DataFrame ops; at scale the
  join is a broadcast of the hit set (top-k) or a semi-join (full
  match set).
- highlighting = windowed snippet extraction around matched terms,
  vectorized over a pandas UDF (the PostingsHighlighter role, minus
  passage ranking).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from lucene_spark.analysis.tokenizer import tokenize


def facet_counts(searcher, query, docs_df: DataFrame, facet_col: str) -> DataFrame:
    """Counts of ``facet_col`` over ALL docs matching ``query``
    (lucene/facet FastTaxonomyFacetCounts role). Returns
    (facet value, cnt) sorted by cnt desc, value asc."""
    matches = searcher.search(query, k=1_000_000_000)
    spark = docs_df.sparkSession
    ids = spark.createDataFrame([(int(d),) for d, _ in matches.hits], "doc_id bigint")
    return (
        docs_df.join(F.broadcast(ids), "doc_id")
        .groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(facet_col))
    )


def sorted_search(searcher, query, docs_df: DataFrame, sort_cols, k: int = 10) -> DataFrame:
    """Sort/SortField + TopFieldCollector role (SURVEY §2.3 sorted
    search): matches of ``query`` ordered by doc-table columns instead
    of relevance — ``ORDER BY ... LIMIT k``, which Catalyst executes as
    TakeOrderedAndProject (per-partition top-k + merge: the early
    termination the reference gets from index sorting). ``sort_cols``
    is a list of (col, ascending) pairs; doc_id asc is the final
    tie-break."""
    matches = searcher.search(query, k=1_000_000_000)
    spark = docs_df.sparkSession
    ids = spark.createDataFrame([(int(d),) for d, _ in matches.hits], "doc_id bigint")
    exprs = [F.asc(c) if asc else F.desc(c) for c, asc in sort_cols] + [F.asc("doc_id")]
    return docs_df.join(F.broadcast(ids), "doc_id").orderBy(*exprs).limit(k)


def group_top_hits(
    searcher, query, docs_df: DataFrame, group_col: str, k_per_group: int = 2
) -> DataFrame:
    """Top-k hits per group value (lucene/grouping
    TopGroups/FirstPassGroupingCollector role, block-join-free variant:
    group key is a doc column). Scores every match, joins the group
    column, ranks within group by (score desc, doc_id asc) — the same
    tie-break as TopScoreDocCollector (HitQueue.java:78-84). Returns
    (group_col, grank, doc_id, score). At scale the hit set stays a
    DataFrame and the window is a shuffle on the group key; the
    broadcast here is of the scored hit ids only."""
    matches = searcher.search(query, k=1_000_000_000)
    spark = docs_df.sparkSession
    hits = spark.createDataFrame(
        [(int(d), float(s)) for d, s in matches.hits], "doc_id bigint, score double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        docs_df.join(F.broadcast(hits), "doc_id")
        .withColumn("grank", F.row_number().over(w))
        .filter(F.col("grank") <= k_per_group)
        .select(group_col, F.col("grank").cast("long"), "doc_id", "score")
    )


def _make_snippet(text: str, terms: set[str], window: int = 6, max_passages: int = 2) -> str:
    toks = text.split()
    marks = [i for i, t in enumerate(toks) if tokenize(t) and tokenize(t)[0] in terms]
    if not marks:
        return ""
    passages, used_end = [], -1
    for m in marks:
        if m <= used_end:
            continue
        lo, hi = max(0, m - window), min(len(toks), m + window + 1)
        frag = " ".join(
            f"<b>{w}</b>" if (tokenize(w) and tokenize(w)[0] in terms) else w for w in toks[lo:hi]
        )
        passages.append(("... " if lo > 0 else "") + frag + (" ..." if hi < len(toks) else ""))
        used_end = hi
        if len(passages) >= max_passages:
            break
    return " ".join(passages)


def highlight(df: DataFrame, terms, text_col: str = "text", window: int = 6) -> DataFrame:
    """Add a ``snippet`` column with <b>-marked passages around query
    terms. Arrow-batched; no per-row Python in the Spark plan."""
    from pyspark.sql.functions import pandas_udf

    tset = set(terms)

    @pandas_udf(StringType())
    def _snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _make_snippet(t or "", tset, window))

    return df.withColumn("snippet", _snip(F.col(text_col)))
