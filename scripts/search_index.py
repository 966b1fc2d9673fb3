"""spark-submit entry point for querying a built index (SearchFiles role).

    spark-submit --py-files lucene_spark.zip scripts/search_index.py \
        --index-dir <index path> \
        [--query 'body:"block max" AND wand'] [--queries-file q.txt] \
        [--k 10] [--mode driver|distributed] [--similarity bm25] \
        [--count] [--explain] [--show-fields repo,path]

Mirrors the reference demo's SearchFiles loop
(lucene/demo/src/java/org/apache/lucene/demo/SearchFiles.java): parse a
classic-syntax query, run top-k BM25, print doc ids + scores, optionally
page with searchAfter semantics via repeated --k. One query per line in
--queries-file; with neither flag, reads queries from stdin.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_query(searcher, store, q: str, args) -> None:
    t0 = time.perf_counter()
    if args.count:
        n = searcher.count(q, mode=args.mode)
        print(json.dumps({"query": q, "count": n,
                          "sec": round(time.perf_counter() - t0, 4)}))
        return
    td = searcher.search(q, k=args.k, mode=args.mode)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"# {q!r}: {td.total_hits} hits ({td.relation}) in {ms:.1f} ms")
    rows = {}
    if store is not None and td.hits:
        ids = [int(d) for d, _ in td.hits]
        fields = [f.strip() for f in args.show_fields.split(",") if f.strip()]
        got = (store.filter(store.doc_id.isin(ids))
                    .select("doc_id", *fields).collect())
        rows = {r["doc_id"]: r for r in got}
    for rank, (doc, score) in enumerate(td.hits, 1):
        extra = ""
        if doc in rows:
            r = rows[doc]
            extra = "  " + " ".join(f"{k}={r[k]!r}" for k in r.asDict() if k != "doc_id")
        print(f"{rank:3d}. doc={doc} score={score:.6f}{extra}")
        if args.explain:
            print("     " + json.dumps(searcher.explain(q, doc)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--queries-file")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["driver", "distributed"], default="driver")
    ap.add_argument("--similarity", default="bm25")
    ap.add_argument("--count", action="store_true", help="Weight#count instead of top-k")
    ap.add_argument("--explain", action="store_true", help="print per-hit score breakdown")
    ap.add_argument("--show-fields", default="", help="comma-separated stored fields to print")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.index import SearchIndex
    from lucene_spark.search.engine import Searcher

    spark = SparkSession.builder.appName("lucene_spark_search").getOrCreate()
    index = SearchIndex(spark, args.index_dir)
    searcher = Searcher(index, similarity=args.similarity)
    store = index.docs if args.show_fields else None

    queries = list(args.query)
    if args.queries_file:
        queries += [ln.strip() for ln in Path(args.queries_file).read_text().splitlines()
                    if ln.strip() and not ln.startswith("#")]
    if queries:
        for q in queries:
            run_query(searcher, store, q, args)
    else:
        for line in sys.stdin:
            q = line.strip()
            if q:
                run_query(searcher, store, q, args)


if __name__ == "__main__":
    main()
