"""Skew drill at sf1 scale: build + query under an adversarial
hot-term distribution, and verify the hot-term chunking keeps every
posting row bounded.

The 100-TB failure mode this exercises: a web-crawl term appearing in
nearly every document ("the", boilerplate tokens) concentrates one
reducer key. The builder's answer is doc-range chunking (one posting
ROW per (term, chunk) instead of per term), so no shuffle key ever
carries more than docs_per_chunk postings. This drill replicates the
sf0.1 documents table R times (default 1600 -> 8M docs, the sf1-x10
scale point) and appends an injected hot term to EVERY doc (df = N),
then:

1. builds the index at local[CPUS], recording docs/sec;
2. reports the skew table: top terms by total postings bytes, the max
   single-row blob, and rows-per-term — asserting
   max_row_postings <= docs_per_chunk (the chunking invariant);
3. runs the bench query p50s including a conjunction over the hot
   term (worst-case WAND/conjunction input).

Usage: python scripts/skew_drill.py [--replicas 1600] [--sf-dir ...]
Prints one JSON line and (re)writes BENCH/SKEW_RUN.md with this run.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=1600)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lucene_spark.gate import corpus_df
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search import ast as A
    from lucene_spark.search.engine import Searcher
    from lucene_spark.session import get_spark

    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    spark = get_spark(
        "skew_drill",
        master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.local.dir": "/dev/shm/spark_local",
        },
    )
    tag = os.path.basename(os.path.normpath(args.sf_dir))
    corpus_path = f"/tmp/lucene_spark_skew/corpus_{tag}_r{args.replicas}"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        base = corpus_df(spark, args.sf_dir)
        n = base.count()
        # adversarial injection: EVERY doc gains 1-3 copies of the hot
        # term (df = N, ttf ~ 2N) plus a medium-hot term on half
        bulk = (
            base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(args.replicas - 1))))
            .select(
                (F.col("doc_id") + F.col("r") * n).alias("doc_id"),
                "repo",
                F.concat(F.col("r").cast("string"), F.lit("/"), F.col("path")).alias("path"),
                "commit",
                "lang",
                F.concat(
                    F.col("content"),
                    F.lit(" "),
                    F.expr("repeat('zipfhot ', CAST(1 + doc_id % 3 AS INT))"),
                    F.when(F.col("doc_id") % 2 == 0, F.lit("halfhot")).otherwise(F.lit("")),
                ).alias("content"),
            )
            .repartition(256, "doc_id")
        )
        bulk.write.mode("overwrite").parquet(corpus_path)
    idx_dir = "/tmp/lucene_spark_skew/index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    dpc = 1 << 14
    cfg = IndexConfig(docs_per_chunk=dpc, term_buckets=8, positions=True)
    # untimed warm-up (worker pool + imports), same as bench.py
    IndexBuilder(spark, cfg).build(
        spark.read.parquet(corpus_path).limit(64), idx_dir + "_warm", assign_ids=False
    )
    shutil.rmtree(idx_dir + "_warm", ignore_errors=True)
    t0 = time.time()
    metrics = IndexBuilder(spark, cfg).build(
        spark.read.parquet(corpus_path), idx_dir, assign_ids=False
    )
    build_sec = time.time() - t0
    n_docs = metrics["docs"]

    index = SearchIndex(spark, idx_dir)
    # skew table: per-term row counts + blob byte stats; the chunking
    # invariant is df-per-row <= docs_per_chunk
    skew_rows = (
        index.postings.select("term", "chunk_id", F.length("blob").alias("bytes"), "df")
        .groupBy("term")
        .agg(
            F.count("*").alias("rows"),
            F.sum("bytes").alias("total_bytes"),
            F.max("bytes").alias("max_row_bytes"),
            F.max("df").alias("max_row_df"),
            F.sum("df").alias("df_total"),
        )
        .orderBy(F.desc("total_bytes"))
        .limit(8)
        .collect()
    )
    global_max_df = index.postings.agg(F.max("df")).first()[0]
    assert global_max_df <= dpc, (
        f"chunking invariant violated: a posting row carries {global_max_df} docs "
        f"> docs_per_chunk {dpc}"
    )

    s = Searcher(index)
    # driver mode for the point-read shapes; distributed (the 100-TB
    # execution mode) for the heavy hot-term conjunction/disjunction —
    # at df ~ corpus size, scoring belongs on the executors
    queries = {
        "q_term": (A.TermQuery("table"), "driver"),
        "q_hot": (A.TermQuery("zipfhot"), "driver"),
        "q_hot_and": (
            A.BooleanQuery(
                ((A.Occur.MUST, A.TermQuery("zipfhot")), (A.Occur.MUST, A.TermQuery("merge")))
            ),
            "driver",
        ),
        "q_hot_and_dist": (
            A.BooleanQuery(
                ((A.Occur.MUST, A.TermQuery("zipfhot")), (A.Occur.MUST, A.TermQuery("merge")))
            ),
            "distributed",
        ),
        "q_or_dist": (
            A.BooleanQuery(
                (
                    (A.Occur.SHOULD, A.TermQuery("dup")),
                    (A.Occur.SHOULD, A.TermQuery("vector")),
                    (A.Occur.SHOULD, A.TermQuery("scan")),
                )
            ),
            "distributed",
        ),
    }
    lat = {}
    for name, (q, mode) in queries.items():
        s.search(q, k=10, mode=mode)  # warm
        ts = []
        for _ in range(3):
            t1 = time.time()
            s.search(q, k=10, mode=mode)
            ts.append(time.time() - t1)
        lat[name] = round(statistics.median(ts) * 1000, 1)

    skew_table = [
        {
            "term": r["term"],
            "rows": int(r["rows"]),
            "total_mb": round(r["total_bytes"] / 1e6, 1),
            "max_row_kb": round(r["max_row_bytes"] / 1e3, 1),
            "max_row_df": int(r["max_row_df"]),
            "df_total": int(r["df_total"]),
        }
        for r in skew_rows
    ]
    out = {
        "n_docs": n_docs,
        "build_sec": round(build_sec, 1),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "docs_per_chunk": dpc,
        "global_max_row_df": int(global_max_df),
        "chunking_invariant": "PASS",
        "query_p50_ms": lat,
        "skew_top_terms": skew_table,
    }
    print(json.dumps(out))

    md = REPO / "BENCH" / "SKEW_RUN.md"
    lines = [
        "# Skew drill — adversarial hot-term build at sf1 scale",
        "",
        f"{n_docs:,} docs ({args.replicas}x {tag}, hot term injected into every doc),",
        f"local[{args.cpus}], docs_per_chunk={dpc}.",
        "",
        f"- build: **{build_sec:.1f} s / {n_docs/build_sec:,.0f} docs/s**",
        f"- chunking invariant: global max df-per-posting-row = {global_max_df:,}",
        f"  <= docs_per_chunk {dpc:,} -> **PASS** (no shuffle key ever carries",
        "  more than one chunk's postings, regardless of term df)",
        "",
        "| term | rows | total MB | max row KB | max row df | df total |",
        "|---|---|---|---|---|---|",
    ]
    for r in skew_table:
        lines.append(
            f"| {r['term']} | {r['rows']:,} | {r['total_mb']} | {r['max_row_kb']} "
            f"| {r['max_row_df']:,} | {r['df_total']:,} |"
        )
    lines += [
        "",
        "Query p50 (ms): " + ", ".join(f"{k} {v}" for k, v in lat.items()),
        "",
    ]
    md.write_text("\n".join(lines))
    print(f"wrote {md}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
