"""spark-submit entry point for cluster index builds.

    spark-submit --py-files lucene_spark.zip scripts/build_index.py \
        --input  <parquet path of (repo, path, commit, lang, content)> \
        --index-dir <output path> \
        [--segments 8] [--docs-per-chunk 131072] [--term-buckets 16] \
        [--no-positions] [--one-shot]

Package the library with:  (cd /root/repo && zip -r lucene_spark.zip lucene_spark)

Resumable by default: re-running the same command after a failure skips
every segment whose checkpoint record exists and whose input
fingerprint still matches (see lucene_spark/index/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--docs-per-chunk", type=int, default=1 << 17)
    ap.add_argument("--term-buckets", type=int, default=16)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--one-shot", action="store_true", help="skip checkpointing (single job)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.checkpoint import ResumableIndexBuilder

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    cfg = IndexConfig(
        docs_per_chunk=args.docs_per_chunk,
        term_buckets=args.term_buckets,
        positions=not args.no_positions,
    )
    corpus = spark.read.parquet(args.input)
    # accept either the canonical (repo, path, commit, lang, content)
    # shape or any table with its own doc_id + a text column
    if "content" not in corpus.columns and "text" in corpus.columns:
        corpus = corpus.withColumnRenamed("text", "content")
    assign = "doc_id" not in corpus.columns
    if assign and not all(k in corpus.columns for k in ("repo", "path", "commit")):
        raise SystemExit("input needs (repo, path, commit) keys or a doc_id column")

    builder = (
        IndexBuilder(spark, cfg)
        if args.one_shot
        else ResumableIndexBuilder(spark, cfg, n_segments=args.segments)
    )
    metrics = builder.build(corpus, args.index_dir, assign_ids=assign)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
