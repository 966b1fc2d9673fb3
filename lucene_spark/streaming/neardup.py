"""Streaming near-duplicate detection — MinHash/LSH with custom state
(`applyInPandasWithState`).

The batch pipeline's MinHash+LSH near-dup (pipeline/dedup.py:
minhash_lsh_pairs) lifted to Structured Streaming: each arriving
document's MinHash signature is banded into LSH bucket keys, and a
STATEFUL operator keyed on (band, bucket) compares the new signature
against the signatures previously seen in that bucket — so a document
is flagged the moment a near-duplicate of anything earlier in the
stream arrives, across micro-batches, without ever joining the stream
against itself.

Scale shape: state is per-bucket (the LSH guarantee: near-identical
docs — and only those — collide), each bucket holds at most
``max_bucket_state`` signatures, and the stateful shuffle is keyed by
bucket — the same partitioning a 1000-executor cluster uses for its
state store. An optional processing-time TTL bounds total state for
unbounded streams (the dropDuplicatesWithinWatermark analogue; dedup
beyond the TTL horizon is then best-effort, the standard trade).

Output: one row per (doc, band) — ``is_dup`` marks a signature
similarity >= threshold against an earlier doc in that bucket.
A doc is a near-duplicate iff ANY of its bands flags; aggregate with
``groupBy(doc).max(is_dup)`` in the consumer (or per micro-batch via
foreachBatch) — kept out of this operator so the stream stays a
single stateful stage.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_spark.pipeline.dedup import (
    _MERSENNE_P,
    _fnv1a64_batch,
    _minhash_params,
    _mulmod_p61,
)


def _signature_udf(n: int, num_perm: int, seed: int):
    """text → MinHash signature (array<long>), fully self-contained so
    it runs statelessly per stream row (no groupBy): tokenize (the
    engine's StandardAnalyzer-equivalent — IDENTICAL to the batch
    pipeline's shingles(), so stream and batch verdicts agree on the
    same text) → word n-gram shingles → FNV-1a64 → min over
    Mersenne-61 permutations. Docs with fewer than ``n`` tokens yield
    a NULL signature: they can never be near-dup candidates (the batch
    path's size(tokens) >= n filter) — a shared sentinel would flag
    every pair of short docs as identical."""
    from lucene_spark.analysis.tokenizer import tokenize_series

    a, b = _minhash_params(num_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        au = a.astype(np.uint64)[None, :]
        bu = b.astype(np.uint64)[None, :]
        out = []
        for toks in tokenize_series(texts):
            sh = [" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))]
            if not sh:
                out.append(None)
                continue
            hs = _fnv1a64_batch(np.array(sorted(set(sh))))
            x = (hs % np.uint64(_MERSENNE_P))[:, None]
            v = (_mulmod_p61(x, au) + bu) % np.uint64(_MERSENNE_P)
            out.append(np.min(v, axis=0).astype(np.int64))
        return pd.Series(out)

    return _sig


_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", LongType()),
        StructField("bucket", StringType()),
        StructField("match_doc", LongType()),
        StructField("similarity", DoubleType()),
        StructField("is_dup", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("docs", ArrayType(LongType())),
        StructField("sigs", ArrayType(BinaryType())),
    ]
)


def stream_minhash_neardup(
    stream_df: DataFrame,
    threshold: float = 0.7,
    n: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "content",
    id_col: str = "doc_id",
    seed: int = 7,
    max_bucket_state: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """→ streaming DataFrame (doc_id, band, bucket, match_doc,
    similarity, is_dup): per-band LSH verdicts against everything
    earlier in the stream. ``similarity`` is the MinHash Jaccard
    estimate (matching signature components / num_perm) against the
    best earlier bucket-mate; docs are processed in doc_id order
    within a micro-batch so results are deterministic under replay."""
    rows = num_perm // bands
    if rows * bands != num_perm:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    sig_udf = _signature_udf(n, num_perm, seed)
    band_expr = (
        f"transform(sequence(0, {bands - 1}), "
        f"b -> struct(CAST(b AS LONG) AS band, array_join(slice(sig, b * {rows} + 1, {rows}), ',') AS bucket))"
    )
    banded = (
        stream_df.select(F.col(id_col).alias("doc_id"), sig_udf(F.col(text_col)).alias("sig"))
        # NULL sig = doc too short to shingle: never a candidate (and
        # never state) — it yields no output rows, like the batch
        # path's size(tokens) >= n filter drops it from pairing
        .filter(F.col("sig").isNotNull())
        .select("doc_id", "sig", F.explode(F.expr(band_expr)).alias("bk"))
        .select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    )
    thr = float(threshold)
    cap = int(max_bucket_state)
    ttl = state_ttl_ms

    def _score(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        band, bucket = int(key[0]), str(key[1])
        if state.exists:
            docs_st, sigs_st = state.get
            docs_st = list(docs_st)
            sigs_st = [np.frombuffer(s, dtype=np.int64) for s in sigs_st]
        else:
            docs_st, sigs_st = [], []
        rows_out = []
        # an iterator is always truthy — materialize before testing
        chunks = list(pdfs)
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values("doc_id")
            for doc, sig in zip(batch["doc_id"], batch["sig"]):
                sv = np.asarray(sig, dtype=np.int64)
                match_doc, best = None, 0.0
                if sigs_st:
                    sims = np.mean(np.stack(sigs_st) == sv[None, :], axis=1)
                    i = int(np.argmax(sims))
                    match_doc, best = int(docs_st[i]), float(sims[i])
                rows_out.append(
                    (int(doc), band, bucket, match_doc, best, bool(best >= thr))
                )
                if len(docs_st) < cap:
                    docs_st.append(int(doc))
                    sigs_st.append(sv)
        state.update((docs_st, [s.tobytes() for s in sigs_st]))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            rows_out,
            columns=["doc_id", "band", "bucket", "match_doc", "similarity", "is_dup"],
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl is not None else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _score, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )
