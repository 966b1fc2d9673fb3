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


def pack_sequences(
    df: DataFrame,
    count_col: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-split sequence packing — the standard LLM-pretraining
    layout: documents are concatenated in deterministic ``id_col``
    order and the token stream is cut into fixed ``seq_len`` training
    sequences, so a document's tokens land at absolute offset
    [begin_off, begin_off + n) and span sequences
    floor(begin/seq_len) .. floor((begin+n-1)/seq_len).

    Returns (doc_id, n_tokens, begin_off, first_seq, last_seq, n_seqs);
    empty documents get first_seq = last_seq = NULL and n_seqs = 0.

    Scale shape: the global running sum is NOT a single-partition
    window. The stream is range-partitioned on doc_id and sorted
    within partitions; per-partition totals (one tiny row each) are
    aggregated, turned into exclusive partition offsets on the driver
    (O(#partitions)), broadcast back, and each partition computes its
    local prefix sum independently — the classic two-phase scan, so
    1000 executors each cumsum their own range and nothing large ever
    centralizes. Partition-count invariance is pytest-verified.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = df.sparkSession
    n_parts = int(
        num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.coalesce(F.col(count_col).cast("long"), F.lit(0)).alias("n_tokens"),
        )
        .repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    base = base.localCheckpoint(eager=False)  # pin the partitioning: the
    # partial-sum pass and the prefix pass must see identical _pid maps
    partials = base.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    totals = {int(r["_pid"]): int(r["_t"]) for r in partials}
    offsets, acc = [], 0
    for pid in sorted(totals):  # repartitionByRange: pid order == key order
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _part_off long")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    begin = F.col("_part_off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = (
        base.join(F.broadcast(off_df), "_pid")
        .withColumn("begin_off", begin.cast("long"))
        .withColumn(
            "first_seq",
            F.when(F.col("n_tokens") > 0, F.floor(F.col("begin_off") / seq_len)),
        )
        .withColumn(
            "last_seq",
            F.when(
                F.col("n_tokens") > 0,
                F.floor((F.col("begin_off") + F.col("n_tokens") - 1) / seq_len),
            ),
        )
        .withColumn(
            "n_seqs",
            F.coalesce(F.col("last_seq") - F.col("first_seq") + 1, F.lit(0)).cast("long"),
        )
    )
    return out.select("doc_id", "n_tokens", "begin_off", "first_seq", "last_seq", "n_seqs")
