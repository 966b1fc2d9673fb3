"""IndexWriter — incremental add/update/delete over a segmented index.

The reference's public ingestion API (lucene/core/src/java/org/apache/
lucene/index/IndexWriter.java: addDocument :1469, updateDocument :1816
= deleteDocuments(Term) + addDocument, deleteDocuments :1768, commit
:4003) over the Spark-native segment layout:

- ``add_documents`` stages a new segment (tokenize + invert one batch —
  a DWPT flush writing the same intermediates the resumable/streaming
  builders use) under ``index_dir/segments/seg=wG``;
- ``update_documents`` tombstones every live doc whose key columns
  match an incoming row (deleteDocuments(Term) with a composite key
  term), then stages the incoming rows as a new segment;
- ``delete_documents`` / ``delete_by_query`` delegate to the liveDocs
  tombstone model (index/deletes.py);
- ``commit`` is the segments_N advance: re-merge all segment
  intermediates into the searchable final layout (SegmentMerger.merge ≅
  one shuffle by term) and rewrite the manifest; with
  ``expunge_deletes=True`` the merge physically drops tombstoned docs
  and recomputes collection stats first (forceMergeDeletes role).

Requires a segmented index (resumable or streaming build, or a
directory this writer created) — a one-shot ``IndexBuilder.build``
index keeps no segment intermediates to merge against, exactly as a
bare Lucene Directory without segment files cannot host a writer.

Scale: each add is one medium Spark job over just the new batch; commit
shuffles the union of segment intermediates by term. At 10^12 docs you
amortize commits (micro-batches stage cheaply; merge runs on a cadence)
— the TieredMergePolicy disposition from SURVEY §3.3.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_spark.index.builder import DOC_KEYS, IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex


class IndexWriter:
    def __init__(self, spark: SparkSession, index_dir: str, config: IndexConfig | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.config = config or IndexConfig()
        self._inner = IndexBuilder(spark, self.config)
        seg_root = f"{index_dir}/segments"
        if os.path.exists(f"{index_dir}/manifest.json") and not os.path.exists(seg_root):
            raise ValueError(
                "IndexWriter needs a segmented index (resumable/streaming build); "
                "this directory holds a one-shot build with no segment intermediates"
            )

    # ---- write path --------------------------------------------------------

    def _next_gen(self) -> int:
        seg_root = f"{self.index_dir}/segments"
        if not os.path.exists(seg_root):
            return 0
        gens = [
            int(m.group(1))
            for p in os.listdir(seg_root)
            if (m := re.fullmatch(r"seg=w(\d+)", p))
        ]
        return max(gens, default=-1) + 1

    def _base_doc_id(self) -> int:
        """Smallest id strictly above every id already staged — scans
        segment docs (covers uncommitted adds), not the merged table."""
        seg_root = f"{self.index_dir}/segments"
        if not os.path.exists(seg_root):
            return 0
        paths = [
            f"{seg_root}/{p}/docs"
            for p in os.listdir(seg_root)
            if os.path.exists(f"{seg_root}/{p}/docs")
        ]
        if not paths:
            return 0
        row = self.spark.read.parquet(*paths).agg(F.max("doc_id")).first()
        return int(row[0]) + 1 if row[0] is not None else 0

    def add_documents(self, df: DataFrame) -> dict:
        """Stage one batch as a new segment. ``df`` is corpus-shaped
        (content + any of repo/path/commit/lang). Returns
        {"segment", "n_docs", "first_doc_id"}."""
        cfg = self.config
        gen = self._next_gen()
        base = self._base_doc_id()
        kcols = [F.col(k) for k in DOC_KEYS if k in df.columns] or [F.col(cfg.field)]
        with_ids = df.withColumn(
            "doc_id", F.row_number().over(Window.orderBy(*kcols)).cast("long") + F.lit(base - 1)
        )
        d = f"{self.index_dir}/segments/seg=w{gen}"
        tokenized = self._inner.tokenized(with_ids)
        tokenized.select(
            "doc_id",
            *[F.col(k) for k in DOC_KEYS if k in df.columns],
            *([F.col("lang")] if "lang" in df.columns else []),
            F.sha2(F.col(cfg.field), 256).alias("content_sha256"),
        ).write.mode("overwrite").parquet(f"{d}/docs")
        tokenized.select("doc_id", "dl", "norm").write.mode("overwrite").parquet(f"{d}/norms")
        self._inner.inverted(tokenized).write.mode("overwrite").parquet(f"{d}/inverted")
        n = self.spark.read.parquet(f"{d}/norms").count()
        return {"segment": f"w{gen}", "n_docs": int(n), "first_doc_id": base}

    def update_documents(self, df: DataFrame, key_cols: tuple[str, ...] = ("repo", "path")) -> dict:
        """updateDocument(Term, doc): tombstone every staged doc whose
        ``key_cols`` match an incoming row, then stage ``df`` as a new
        segment. Visible after ``commit()``."""
        from lucene_spark.index.deletes import delete_docs

        seg_root = f"{self.index_dir}/segments"
        doc_paths = (
            [f"{seg_root}/{p}/docs" for p in os.listdir(seg_root) if os.path.exists(f"{seg_root}/{p}/docs")]
            if os.path.exists(seg_root)
            else []
        )
        n_del = 0
        if doc_paths:
            existing = self.spark.read.parquet(*doc_paths)
            keys = df.select(*key_cols).distinct()
            hit = existing.join(F.broadcast(keys), list(key_cols)).select("doc_id")
            n_hit = hit.count()
            if n_hit:
                n_del = delete_docs(self.spark, self.index_dir, hit)
        added = self.add_documents(df)
        return {"tombstones": int(n_del), **added}

    def delete_documents(self, doc_ids) -> int:
        from lucene_spark.index.deletes import delete_docs

        return delete_docs(self.spark, self.index_dir, doc_ids)

    def delete_by_query(self, query) -> int:
        """deleteDocuments(Query): needs a committed, searchable index."""
        from lucene_spark.index.deletes import delete_by_query
        from lucene_spark.search.engine import Searcher

        return delete_by_query(Searcher(SearchIndex(self.spark, self.index_dir)), query)

    # ---- commit ------------------------------------------------------------

    def commit(self, expunge_deletes: bool = False) -> SearchIndex:
        """Merge all segments into the searchable layout and advance the
        manifest (the segments_N commit point). ``expunge_deletes``
        physically drops tombstoned docs and recomputes stats
        (forceMergeDeletes); otherwise tombstones stay liveDocs masks."""
        from lucene_spark.index.checkpoint import ResumableIndexBuilder
        from lucene_spark.index.deletes import purge_deletes

        if expunge_deletes and os.path.exists(f"{self.index_dir}/deletes"):
            purge_deletes(self.spark, self.index_dir, self.config)
        else:
            ResumableIndexBuilder(self.spark, self.config).merge(self.index_dir)
        stats = self.spark.read.parquet(f"{self.index_dir}/collection_stats").first()
        with open(f"{self.index_dir}/manifest.json", "w") as fh:
            json.dump(
                {
                    "docs": int(stats["doc_count"]),
                    "docs_per_chunk": self.config.docs_per_chunk,
                    "mode": "writer",
                },
                fh,
            )
        return SearchIndex(self.spark, self.index_dir)
