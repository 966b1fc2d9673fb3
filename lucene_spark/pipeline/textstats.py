"""Text analysis operators: quality scoring, language ID heuristic,
token counting, document fingerprinting.

Everything except tokenization (the engine's vectorized analyzer UDF)
is JVM-side column arithmetic — whole-stage codegen, no Python in the
hot path, so these run at scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import tokens_df

# fixed English stopword probe set (used by the language heuristic and
# the stopword-ratio quality signal). Deliberately tiny + frozen so the
# result is reproducible and SQL-expressible.
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")).join(
        tokens_df(df, text_col, id_col), "doc_id"
    )


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: token count, char count, mean token
    length, stopword ratio, distinct-token (type/token) ratio."""
    t = _with_tokens(df, text_col, id_col)
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tok = F.size("tokens")
    return t.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.length("_text").cast("long").alias("n_chars"),
        F.round(
            F.when(n_tok > 0, F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")).cast("double") / n_tok).otherwise(0.0),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(n_tok > 0, F.size(F.filter("tokens", lambda x: F.array_contains(sw, x))).cast("double") / n_tok).otherwise(0.0),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, F.size(F.array_distinct("tokens")).cast("double") / n_tok).otherwise(0.0), 4
        ).alias("ttr"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Stopword-probe language heuristic: docs whose English-stopword
    ratio clears ``threshold`` are tagged 'en', else 'unknown'.
    (A real pipeline would use char n-gram profiles per language; the
    operator shape — vectorized ratio + threshold — is identical.)"""
    t = _with_tokens(df, text_col, id_col)
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tok = F.size("tokens")
    ratio = F.when(n_tok > 0, F.size(F.filter("tokens", lambda x: F.array_contains(sw, x))).cast("double") / n_tok).otherwise(0.0)
    return t.select(
        "doc_id",
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, analyzer token count, and a BPE-ish
    subword estimate (ceil(len/4) pieces per token — the deterministic
    stand-in for a real BPE vocab; swap the expression for a trained
    tokenizer UDF in production)."""
    t = _with_tokens(df, text_col, id_col)
    # every column is a plain integer quantity with exact SQL
    # equivalents (no float ceil, no trim edge cases): ws_tokens counts
    # NON-EMPTY whitespace-separated chunks; bpe_est = Σ ceil(len/4)
    # via integer arithmetic (len+3) div 4.
    return t.select(
        "doc_id",
        F.size(F.filter(F.split("_text", r"\s+"), lambda x: x != F.lit("")))
        .cast("long")
        .alias("ws_tokens"),
        F.size("tokens").cast("long").alias("an_tokens"),
        F.aggregate(
            "tokens",
            F.lit(0).cast("long"),
            lambda a, x: a + F.floor((F.length(x) + F.lit(3)) / F.lit(4)).cast("long"),
        ).alias("bpe_est"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical-form document fingerprint: md5 over the analyzer token
    stream joined by single spaces — whitespace/case-insensitive
    identity for exact-ish dedup keys."""
    t = tokens_df(df, text_col, id_col)
    return t.select("doc_id", F.md5(F.array_join("tokens", " ")).alias("fp"))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_n: int = 2
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition filters):

    - ``dup_line_frac``     fraction of lines that repeat an earlier
      line (1 - distinct/total over ``\\n``-split lines)
    - ``dup_line_char_frac`` fraction of line characters inside repeat
      occurrences (Σ (cnt-1)·len over duplicated lines / Σ cnt·len)
    - ``top_ngram_char_frac`` fraction of token characters covered by
      the single most frequent word ``top_n``-gram: cnt·len(gram
      without separators) / Σ len(token). Ties break to the
      lexicographically largest gram (struct-max order).

    Shapes: line metrics are pure array expressions (zero shuffle);
    the top-n-gram needs one (doc, gram) aggregation — one shuffle
    keyed by doc+gram, partial-aggregated map-side. Everything is
    JVM-side (whole-stage codegen), no Python.
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    lines = F.filter(F.split("_text", "\n"), lambda x: F.length(x) > 0)
    dlines = F.array_distinct(lines)
    total_len = F.aggregate(lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long"))
    dist_len = F.aggregate(dlines, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long"))
    line_metrics = base.select(
        "doc_id",
        F.round(
            F.when(F.size(lines) > 0, 1.0 - F.size(dlines).cast("double") / F.size(lines)).otherwise(0.0),
            4,
        ).alias("dup_line_frac"),
        F.round(
            F.when(total_len > 0, 1.0 - dist_len.cast("double") / total_len).otherwise(0.0), 4
        ).alias("dup_line_char_frac"),
    )

    from lucene_spark.pipeline.curation import _ngram_col

    toks = F.filter(F.split(F.lower("_text"), r"[^a-z0-9]+"), lambda x: x != "")
    tok_chars = base.select(
        "doc_id",
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")).alias(
            "_tok_chars"
        ),
    )
    grams = base.select("doc_id", F.explode(_ngram_col("_text", top_n)).alias("gram"))
    top = (
        grams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("count"), F.col("gram"))).alias("_cg"))
        .select("doc_id", F.col("_cg.count").alias("_cnt"), F.col("_cg.gram").alias("_gram"))
    )
    return (
        line_metrics.join(tok_chars, "doc_id")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "dup_line_frac",
            "dup_line_char_frac",
            F.round(
                F.when(
                    F.col("_tok_chars") > 0,
                    # docs with >0 token chars but fewer than top_n
                    # tokens have no n-gram at all (_cnt NULL from the
                    # left join): Gopher semantics give 0.0, not NULL
                    F.coalesce(
                        F.col("_cnt")
                        * (F.length("_gram") - F.lit(top_n - 1)).cast("double")
                        / F.col("_tok_chars"),
                        F.lit(0.0),
                    ),
                ).otherwise(0.0),
                4,
            ).alias("top_ngram_char_frac"),
        )
    )
