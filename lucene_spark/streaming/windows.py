"""Event-time windowed aggregation — tumbling/sliding and session
windows over an event stream (the Structured Streaming windowed-agg
surface; identical semantics on a batch frame, Spark's unification).

These are the aggregation shapes an NRT analytics consumer runs next
to the index (per-type event rates, user sessionization for the
training-data pipeline's interaction logs). Both run unchanged on a
``readStream`` source — add ``withWatermark`` upstream to bound state
and emit finalized windows (the late-data contract); on a batch frame
they compute the same result in one pass.

Scale shape: one shuffle keyed by (window, group) — the window column
is derived, so partition pruning on the time column still applies to
the scan; session windows shuffle by user (Spark merges session state
per key, the same state-store partitioning as any stateful op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple = ("event_type",),
    window: str = "10 minutes",
    slide: str | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time windows:
    (window_start epoch seconds, *group_cols, n_events[, sum_value]).
    Window origin is the epoch (Spark's ``F.window`` alignment)."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        df.groupBy(w.alias("w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *[F.col(c) for c in group_cols],
            *[F.col(a) for a in (["n_events"] + (["sum_value"] if value_col else []))],
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Session windows per user (``F.session_window``): consecutive
    events of a user merge into one session while each arrives before
    the previous event's time + ``gap``; an event exactly ``gap`` after
    the previous starts a NEW session (the window is [start, last+gap)).
    Returns (user, session_start epoch seconds, n_events[, sum_value])."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(*aggs)
        .select(
            F.col(user_col),
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            *[F.col(a) for a in (["n_events"] + (["sum_value"] if value_col else []))],
        )
    )
