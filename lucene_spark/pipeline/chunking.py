"""Document chunking — token-window splitting for training-data prep.

A 100 TB pretraining pipeline splits long documents into bounded
token windows (with overlap, so no boundary context is lost) before
tokenizer-level packing.  This operator is pure JVM column algebra —
split → sequence → explode → slice, whole-stage codegen end-to-end,
no Python and no shuffle: chunking is embarrassingly parallel per
document, so the plan is a single map stage over the scan.

Window semantics (the standard sliding window used by training-data
pipelines): tokens are whitespace runs; windows are ``chunk_tokens``
long with ``overlap`` tokens shared between neighbors (stride =
chunk_tokens - overlap); the LAST window always reaches the end of
the document, so

    n_chunks(n) = 0                          if n == 0
                = 1                          if n <= chunk_tokens
                = 1 + ceil((n - chunk_tokens) / stride)   otherwise

Every token index is covered and every chunk except possibly the last
has exactly ``chunk_tokens`` tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, begin_tok, chunk_text) —
    one row per sliding window.  ``begin_tok`` is the 0-based token
    index the window starts at; ``chunk_text`` rejoins the window's
    tokens with single spaces (whitespace-normalized, as packing
    pipelines do)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    ct = F.lit(int(chunk_tokens))
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0)
    n: Column = F.size(F.col("_toks"))
    n_chunks = F.when(n <= ct, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - ct).cast("double") / F.lit(float(stride))).cast("long")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("begin_tok"),
            F.slice("_toks", (F.col("chunk_idx") * stride + 1).cast("int"), int(chunk_tokens)).alias("_w"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_w").cast("long").alias("n_chunk_tokens"),
            F.col("begin_tok").cast("long"),
            F.array_join("_w", " ").alias("chunk_text"),
        )
    )
