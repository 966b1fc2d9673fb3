"""Event-time windowed aggregation: batch ≡ brute force, and the SAME
code over a readStream source converges to the batch answer."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from lucene_spark.streaming.windows import sessionize, windowed_event_counts


@pytest.fixture(scope="module")
def events_pdf():
    rows = []
    t0 = datetime(2024, 1, 1)
    for i in range(400):
        rows.append(
            {
                "event_id": i,
                "ts": t0 + timedelta(seconds=(i * 137) % 7200),
                "user_id": i % 7,
                "event_type": ["view", "click", "error"][i % 3],
                "value": round((i * 13) % 100 / 4.0, 2),
            }
        )
    return pd.DataFrame(rows)


def _brute_windows(pdf, secs=600):
    out = {}
    for r in pdf.itertuples():
        ws = int(r.ts.timestamp() // secs) * secs
        k = (ws, r.event_type)
        n, s = out.get(k, (0, 0.0))
        out[k] = (n + 1, s + r.value)
    return {k: (n, round(s, 2)) for k, (n, s) in out.items()}


def _brute_sessions(pdf, gap_s=1800):
    out = []
    for uid, grp in pdf.sort_values("ts").groupby("user_id"):
        cur = None
        for r in grp.itertuples():
            if cur is None or (r.ts - cur["last"]).total_seconds() >= gap_s:
                if cur:
                    out.append(cur)
                cur = {"user_id": uid, "start": r.ts, "last": r.ts, "n": 1, "sum": r.value}
            else:
                cur["last"] = r.ts
                cur["n"] += 1
                cur["sum"] += r.value
        if cur:
            out.append(cur)
    return {
        (c["user_id"], int(math.floor(c["start"].timestamp()))): (c["n"], round(c["sum"], 2))
        for c in out
    }


def test_windowed_counts_batch(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in windowed_event_counts(df).collect()
    }
    assert got == _brute_windows(events_pdf)


def test_sessionize_batch(spark, events_pdf):
    df = spark.createDataFrame(events_pdf)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["sum_value"], 2))
        for r in sessionize(df).collect()
    }
    assert got == _brute_sessions(events_pdf)


def test_windowed_counts_streaming_converges(spark, events_pdf, tmp_path):
    """The identical windowed_event_counts over a readStream source
    (two micro-batches, complete output mode) ends at the batch
    answer."""
    src = str(tmp_path / "evsrc")
    os.makedirs(src)
    half = len(events_pdf) // 2
    schema = spark.createDataFrame(events_pdf).schema
    spark.createDataFrame(events_pdf.iloc[:half]).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(events_pdf.iloc[half:]).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("ev_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ev_win").collect()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in rows
    }
    assert got == _brute_windows(events_pdf)
