"""Corpus profiling at scale: sketch + exact statistics a training-data
pipeline runs before/after curation (vocabulary size, length
distribution, dominant terms).

Each statistic has the EXACT computation (oracle-checkable, one
shuffle) next to the sketch path (approximate, constant memory — the
shape that profiles 100 TB in one pass):
- vocabulary: exact ``countDistinct`` vs HyperLogLog++
  (``approx_count_distinct``, Spark's HLL++ with configurable rsd);
- length quantiles: exact ``percentile`` (linear interpolation) — the
  sketch twin is ``percentile_approx`` (Greenwald-Khanna);
- heavy hitters: exact top-k by total term frequency (map-side
  combined aggregation; the count-min role — at 100 TB the exact agg
  is still one shuffle of (term, partial count) pairs, which is why
  the exact path is the default here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tok_col(text_col: str):
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda x: x != "")


def vocabulary_stats(
    df: DataFrame,
    text_col: str = "text",
    rsd: float = 0.05,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row: (n_docs, n_tokens, vocab_exact, vocab_hll). The HLL++
    estimate is deterministic for a given input (hash-based,
    order-independent) with relative standard deviation ``rsd``.

    Single scan of the corpus: ``explode_outer`` keeps a null-term row
    for token-less docs so ``n_docs`` (distinct ``id_col``) counts them,
    while count(term)/countDistinct(term) ignore the null rows."""
    toks = df.select(id_col, F.explode_outer(_tok_col(text_col)).alias("term"))
    return toks.agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count("term").cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("vocab_exact"),
        F.approx_count_distinct("term", rsd).cast("long").alias("vocab_hll"),
    )


def length_quantiles(
    df: DataFrame, probs=(0.25, 0.5, 0.75, 0.95), text_col: str = "text"
) -> DataFrame:
    """Token-count quantiles, EXACT with linear interpolation (one row
    per prob). ``percentile_approx`` is the drop-in sketch twin when
    the corpus no longer fits a single sort."""
    lens = df.select(F.size(_tok_col(text_col)).cast("double").alias("len"))
    agg = lens.agg(
        F.percentile("len", F.array(*[F.lit(float(p)) for p in probs])).alias("qs")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in probs]).alias("prob"), F.col("qs").alias("q")
    )
    return (
        agg.select(F.explode(pairs).alias("pq"))
        .select(F.col("pq.prob").alias("prob"), F.col("pq.q").alias("q"))
        .orderBy("prob")
    )


def term_heavy_hitters(df: DataFrame, k: int = 10, text_col: str = "text") -> DataFrame:
    """Top-k terms by total occurrences (ttf) with their doc freq —
    one exploded aggregation, map-side combined; ties break term asc."""
    occ = df.select(F.col("doc_id"), F.explode(_tok_col(text_col)).alias("term"))
    return (
        occ.groupBy("term")
        .agg(F.count("*").cast("long").alias("ttf"), F.countDistinct("doc_id").cast("long").alias("df"))
        .orderBy(F.desc("ttf"), F.asc("term"))
        .limit(k)
    )
