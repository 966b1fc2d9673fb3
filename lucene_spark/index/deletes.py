"""Delete support — the liveDocs tombstone model.

Lucene marks deletions in a per-segment bitset applied at search time
(lucene/core/src/java/org/apache/lucene/codecs/lucene90/
Lucene90LiveDocsFormat.java); postings, norms, and collection
statistics stay untouched until a merge physically drops the documents
(SegmentMerger via MergeState.DocMap / deletesPctAllowed in
TieredMergePolicy.java:89-95). Same contract here:

- ``delete_docs`` appends tombstone rows to ``{index_dir}/deletes``
  (Iceberg swap-in: equality-delete files);
- ``SearchIndex.deleted_ids`` loads them once per reader open (the
  reader-level liveDocs snapshot);
- the Searcher masks deleted docs out of every candidate set — scores
  of surviving docs are UNCHANGED (df/norms/avgdl still count the
  deleted docs, exactly like Lucene before a merge);
- ``purge_deletes`` rewrites the index without the tombstoned docs and
  recomputes statistics — the merge-applies-deletes step.

Scale: tombstones are a doc_id column read once per reader; at 10^12
docs you bucket them by doc-range alongside the postings chunks so each
chunk kernel loads only its range (same pruning as norms).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> int:
    """Append tombstones. ``doc_ids``: iterable of ints or a DataFrame
    with a doc_id column. Returns total tombstone count."""
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col("doc_id").cast("long"))
    else:
        df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    df.write.mode("append").parquet(f"{index_dir}/deletes")
    return spark.read.parquet(f"{index_dir}/deletes").distinct().count()


def delete_by_query(searcher, query) -> int:
    """IndexWriter.deleteDocuments(Query..) (IndexWriter.java:1768):
    tombstone every document matching ``query`` (string or AST).
    Like Lucene, an already-open reader keeps its liveDocs snapshot —
    reopen a SearchIndex to observe the deletes (DirectoryReader
    contract). Returns the total tombstone count."""
    matches = searcher.search(query, k=1_000_000_000)
    return delete_docs(
        searcher.index.spark, searcher.index.index_dir, [d for d, _ in matches.hits]
    )


def load_deleted(spark: SparkSession, index_dir: str):
    import numpy as np

    path = f"{index_dir}/deletes"
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    rows = spark.read.parquet(path).distinct().orderBy("doc_id").collect()
    import numpy as np

    return np.array([r["doc_id"] for r in rows], dtype=np.int64)


def purge_deletes(spark: SparkSession, index_dir: str, config=None) -> dict:
    """Physically drop tombstoned docs: rebuild the final tables from
    the segment intermediates minus deletes, recomputing stats — the
    Lucene merge that 'applies deletes'. Requires a segmented index
    (resumable/streaming layout keeps ``segments/``)."""
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.checkpoint import ResumableIndexBuilder

    path = f"{index_dir}/deletes"
    if not os.path.exists(path):
        return {"purged": 0}
    dele = spark.read.parquet(path).distinct()
    n = dele.count()
    seg_root = f"{index_dir}/segments"
    if not os.path.exists(seg_root):
        raise ValueError("purge needs a segmented index (resumable or streaming build)")
    for seg in os.listdir(seg_root):
        d = f"{seg_root}/{seg}"
        for table in ("inverted", "docs", "norms"):
            src = spark.read.parquet(f"{d}/{table}")
            kept = src.join(dele, "doc_id", "left_anti")
            kept.write.mode("overwrite").parquet(f"{d}/{table}_purged")
        for table in ("inverted", "docs", "norms"):
            import shutil

            shutil.rmtree(f"{d}/{table}")
            os.rename(f"{d}/{table}_purged", f"{d}/{table}")
            spark.catalog.refreshByPath(f"{d}/{table}")
    merger = ResumableIndexBuilder(spark, config or IndexConfig())
    rec = merger.merge(index_dir)
    # tombstones are applied — clear them
    import shutil

    shutil.rmtree(path)
    return {"purged": int(n), **rec}
