"""Streaming exact dedup — cross-batch duplicate suppression for a
document stream.

The batch pipeline's exact dedup (pipeline/dedup.py: sha256 groupBy)
lifted to Structured Streaming: each micro-batch's documents are
fingerprinted JVM-side (sha256 over the text) and duplicates are
suppressed ACROSS batches with streaming dedup state.  Two state
regimes, matching Spark's own contract:

* with an event-time column: ``withWatermark`` +
  ``dropDuplicatesWithinWatermark`` — state for a fingerprint is
  dropped once the watermark passes it, so state size is bounded by
  the watermark window regardless of stream length (the only shape
  that survives an unbounded 100 TB/day stream);
* without: plain ``dropDuplicates`` — exact global dedup with
  unbounded state (bounded corpora / replays).

First-wins semantics per fingerprint, like the batch ``canonical_docs``
with arrival order as the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "content",
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
    extra_key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deduplicated stream: one surviving row per (sha256(text),
    *extra_key_cols).  Adds the ``content_sha256`` column (kept in the
    output — downstream sinks use it as the canonical doc key)."""
    out = stream_df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    keys = ["content_sha256", *extra_key_cols]
    if event_time_col is not None:
        return out.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            keys
        )
    return out.dropDuplicates(keys)
