"""HNSW graph BUILD throughput (vectors/sec) — A/B-able via --repo.

Round-4 verdict #2: _build_graph inserted one node at a time with
scalar Python dots. Replicates the sf embeddings table to --n vectors
(deterministic per-replica perturbation so the diversity heuristic sees
distinct vectors), builds the sharded graph sidecar, prints one JSON
line {vectors, shards, build_sec, vectors_per_sec}.

Usage: python scripts/bench_hnsw.py [--repo /root/repo] [--n 50000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    repo = os.path.abspath(args.repo)
    sys.path.insert(0, repo)
    # the PYTHON WORKERS must resolve lucene_spark from the target repo
    # too (cloudpickle ships module functions by reference): PYTHONPATH
    # propagates to them in local mode, and running from a repo cwd
    # would otherwise shadow it
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    os.chdir("/tmp")
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.hnsw import build_hnsw
    from lucene_spark.session import get_spark

    spark = get_spark("bench_hnsw", master=f"local[{args.cpus}]")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    base = emb.count()
    reps = max(1, math.ceil(args.n / base))
    # materialized once outside the timed region (a .limit() in the
    # lineage would serialize the build's input scan to one partition)
    src = f"/tmp/lucene_spark_bench/hnsw_src_{args.n}"
    if not os.path.exists(f"{src}/_SUCCESS"):
        (
            emb.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
            .select(
                (F.col("vec_id") + F.col("r") * base).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> x + 0.01 * sin(CAST(vec_id AS DOUBLE)"
                    " * 0.73 + i * 1.31 + r * 2.17))"
                ).alias("embedding"),
            )
            .filter(F.col("vec_id") < args.n)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(src)
        )
    df = spark.read.parquet(src)
    out = f"/tmp/lucene_spark_bench/hnsw_{os.path.basename(repo.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    # warm the Python worker pool so the timed run is build cost only
    build_hnsw(df.limit(256), out + "_warm", n_shards=2)
    shutil.rmtree(out + "_warm", ignore_errors=True)
    t0 = time.time()
    build_hnsw(df, out, n_shards=args.shards)
    dt = time.time() - t0
    print(json.dumps({
        "vectors": args.n, "shards": args.shards,
        "build_sec": round(dt, 2), "vectors_per_sec": round(args.n / dt),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
