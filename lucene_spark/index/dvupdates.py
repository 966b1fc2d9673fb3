"""Numeric doc-values updates — metadata changes without reindexing.

Reference: lucene/core/src/java/org/apache/lucene/index/IndexWriter.java
updateNumericDocValue(Term, String, long) (:1900-1930) — rewrite a
per-document value WITHOUT re-inverting the document; updates land in
per-segment "DV update" gen files (Lucene90DocValuesFormat side files)
that readers overlay at open, and a merge rewrites them into the
segment (the copy-on-write compaction).

Spark disposition: the docs table is the doc-values store (SURVEY
§1.2), so an update is a parquet delta under
``<index>/dv_updates/<field>/gen=N/`` and reads overlay it
merge-on-read: latest-gen value per doc wins, base value otherwise —
exactly the Iceberg/Hudi MOR shape, which is what this becomes at
100 TB (position deltas + compaction). The inverted index, norms, and
statistics are untouched: BM25 scores cannot change, only stored
values / filters / sorts / function scores see the new data.

Reader snapshot contract: SearchIndex caches ``docs`` at first touch
(DirectoryReader semantics) — reopen the index to observe updates,
like deletes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _updates_root(index_dir: str) -> str:
    return os.path.join(index_dir, "dv_updates")


def updated_fields(index_dir: str) -> list[str]:
    root = _updates_root(index_dir)
    if not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))


def _next_gen(field_dir: str) -> int:
    if not os.path.isdir(field_dir):
        return 0
    gens = [
        int(m.group(1))
        for d in os.listdir(field_dir)
        if (m := re.fullmatch(r"gen=(\d+)", d))
    ]
    return max(gens) + 1 if gens else 0


def update_numeric_doc_values(
    spark: SparkSession, index_dir: str, field: str, updates
) -> int:
    """Stage a numeric DV update generation for ``field``.

    ``updates``: {doc_id: value} dict or a DataFrame(doc_id, value).
    Returns the generation number written. Cost is O(|updates|) — the
    docs table is not rewritten (updateNumericDocValue's whole point).

    Unknown fields are rejected up front (IndexWriter.updateNumericDocValue
    throws IllegalArgumentException for a field with no doc values,
    IndexWriter.java:1900-1930) — otherwise one bad update would break
    every subsequent reader open until the sidecar is removed."""
    docs_cols = {f.name for f in spark.read.parquet(f"{index_dir}/docs").schema.fields}
    if field not in docs_cols:
        raise ValueError(
            f"can only update existing doc-values fields: {field!r} "
            f"not in docs columns {sorted(docs_cols)}"
        )
    if isinstance(updates, dict):
        rows = [(int(d), float(v)) for d, v in updates.items()]
        df = spark.createDataFrame(rows, "doc_id bigint, value double")
    else:
        df = updates.select(
            F.col("doc_id").cast("long"), F.col("value").cast("double")
        )
    field_dir = os.path.join(_updates_root(index_dir), field)
    gen = _next_gen(field_dir)
    df.withColumn("gen", F.lit(gen)).write.mode("errorifexists").parquet(
        os.path.join(field_dir, f"gen={gen}")
    )
    return gen


def overlay_docs(spark: SparkSession, index_dir: str, docs: DataFrame) -> DataFrame:
    """Merge-on-read view: for every updated field, the latest-gen
    value per doc overrides the base column (cast back to the base
    column's type). One broadcast-eligible left join per updated field;
    AQE keeps it a broadcast join while deltas are small."""
    fields = updated_fields(index_dir)
    if not fields:
        return docs
    base_types = dict(docs.dtypes)
    for field in fields:
        if field not in base_types:  # sidecar staged against a schema
            continue  # this docs table never had — skip, don't break opens
        upd = spark.read.parquet(os.path.join(_updates_root(index_dir), field))
        latest = upd.groupBy("doc_id").agg(F.max_by("value", "gen").alias("__dv_upd"))
        docs = (
            docs.join(latest, "doc_id", "left")
            .withColumn(
                field,
                F.coalesce(F.col("__dv_upd").cast(base_types[field]), F.col(field)),
            )
            .drop("__dv_upd")
        )
    return docs


def apply_dv_updates(spark: SparkSession, index_dir: str) -> list[str]:
    """Compaction (the merge-applies-DV-updates role): rewrite the docs
    table with all updates folded in and drop the sidecar. Returns the
    fields that were folded."""
    import shutil

    fields = updated_fields(index_dir)
    if not fields:
        return []
    base = spark.read.parquet(f"{index_dir}/docs")
    merged = overlay_docs(spark, index_dir, base)
    tmp = f"{index_dir}/docs_dvtmp"
    docs_dir = f"{index_dir}/docs"
    tiers = sorted(
        p for p in os.listdir(docs_dir) if p.startswith("tier=") and not p.startswith("tier=_")
    )
    if tiers:
        # tiered (hive-partitioned) writer layout: rewrite PER TIER so
        # the partition dirs survive — a flat rewrite would leave the
        # next commit's tier=K beside bare part files and break
        # partition discovery for every later reader open
        merged.write.mode("overwrite").partitionBy("tier").parquet(tmp)
        shutil.rmtree(docs_dir)
        os.makedirs(docs_dir)
        for p in os.listdir(tmp):
            if p.startswith("tier="):
                os.rename(os.path.join(tmp, p), os.path.join(docs_dir, p))
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(docs_dir)
        os.rename(tmp, docs_dir)
    spark.catalog.refreshByPath(docs_dir)
    shutil.rmtree(_updates_root(index_dir))
    return fields
