"""Exact-substring deduplication: cross-document duplicated n-gram
spans (the "Deduplicating Training Data Makes Language Models Better"
protocol, Lee et al. 2022, at word-n-gram granularity).

A span of a document is *duplicated* when the word n-gram starting
there also occurs in at least ``min_doc_freq`` distinct documents.
Overlapping duplicated n-grams merge into maximal spans (the paper's
suffix-array clusters; word n-grams are the distributable analogue —
a suffix array is a single-machine structure, the n-gram inversion is
one shuffle).

Scale shape (100 TB):
- one map-only projection explodes (doc, pos, gram);
- ONE shuffle groups by gram for the distinct-doc count (map-side
  partial aggregation applies; at petabyte scale substitute
  ``xxhash64(gram)`` for the join key to cut shuffle bytes — the
  string key is kept here so the DuckDB oracle can reproduce the
  grouping verbatim);
- the duplicated-gram set joins back to occurrences on the same key
  (co-partitioned, no extra shuffle of the corpus);
- span merging is a per-doc window (island detection), pure JVM;
- text cleaning is an array-lambda over the token array — zero
  Python, zero extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks_col(text_col: str):
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda x: x != "")


def ngram_occurrences(
    df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, gram) for every word n-gram occurrence; ``pos`` is
    the 0-based token offset of the gram's first token."""
    toks = _toks_col(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col).alias("doc_id"), F.posexplode(grams).alias("pos", "gram"))


def duplicated_gram_set(occ: DataFrame, min_doc_freq: int = 2) -> DataFrame:
    """Grams occurring in >= min_doc_freq DISTINCT docs (one shuffle)."""
    return (
        occ.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_doc_freq)
        .select("gram")
    )


def duplicated_ngram_spans(
    df: DataFrame,
    n: int = 5,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc maximal duplicated spans. Returns (doc_id, spans:
    array<struct<start, end>> token ranges [start, end), n_tokens,
    dup_tokens, dup_frac) for docs with at least one duplicated span.

    Span merge = island detection: order covered starts, a new island
    begins where start exceeds the running max end of earlier
    intervals — one window pass, whole-stage codegen."""
    occ = ngram_occurrences(df, n, text_col, id_col)
    dup = duplicated_gram_set(occ, min_doc_freq)
    covered = occ.join(dup, "gram").select(
        "doc_id", F.col("pos").alias("start"), (F.col("pos") + n).alias("end")
    )
    w = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = covered.withColumn(
        "new_island", F.when(F.col("start") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0)
    ).withColumn("island", F.sum("new_island").over(w))
    spans = (
        islands.groupBy("doc_id", "island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("start", "end"))).alias("spans"),
            F.sum(F.col("end") - F.col("start")).alias("dup_tokens"),
        )
    )
    ntok = df.select(
        F.col(id_col).alias("doc_id"), F.size(_toks_col(text_col)).cast("long").alias("n_tokens")
    )
    return spans.join(ntok, "doc_id").select(
        "doc_id",
        "spans",
        "n_tokens",
        F.col("dup_tokens").cast("long"),
        (F.col("dup_tokens") / F.col("n_tokens")).alias("dup_frac"),
    )


def remove_duplicated_ngrams(
    df: DataFrame,
    n: int = 5,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents with duplicated spans cut out (the Lee-et-al "drop the
    duplicated substring" policy at token granularity). Returns the
    input relation with ``text_col`` rewritten (space-joined surviving
    tokens; lowercased word tokens, the oracle's tokenizer) plus
    dup_tokens. Docs without duplicated spans pass through with
    dup_tokens = 0. The cut is an array-lambda filter over the token
    array against the doc's merged span list — no explode, no Python."""
    spans = duplicated_ngram_spans(df, n, min_doc_freq, text_col, id_col).select(
        F.col("doc_id").alias(id_col), "spans", "dup_tokens"
    )
    out = df.join(spans, id_col, "left")
    toks = _toks_col(text_col)
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("spans"), lambda s: (i >= s["start"]) & (i < s["end"])
        ),
    )
    cleaned = F.when(F.col("spans").isNull(), F.array_join(toks, " ")).otherwise(
        F.array_join(kept, " ")
    )
    return out.select(
        F.col(id_col),
        cleaned.alias(text_col),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
    )
