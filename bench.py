"""Per-round benchmark harness (driver contract).

Builds the inverted index over $SPARK_GRAFT_SF_DIR/documents.parquet on
local[$SPARK_GRAFT_CPUS], then runs the headline BM25 query set (terms,
boolean AND/OR/NOT, phrase, dismax, wildcard — the shape of the
reference's query workload, lucene/benchmark/conf/query-*.txt) in
driver mode (warm) and reports per-query p50 latency.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: p50_sec, ...}, "sf": f,
   "build_sec": ..., "docs_per_sec": ..., "n_docs": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lucene_spark.search import ast as A  # noqa: E402

QUERIES: dict[str, A.Query] = {
    "q_term": A.TermQuery("table"),
    "q_term_rare": A.TermQuery("dup"),
    "q_and": A.BooleanQuery(
        ((A.Occur.MUST, A.TermQuery("merge")), (A.Occur.MUST, A.TermQuery("vector")))
    ),
    "q_or": A.BooleanQuery(
        (
            (A.Occur.SHOULD, A.TermQuery("dup")),
            (A.Occur.SHOULD, A.TermQuery("vector")),
            (A.Occur.SHOULD, A.TermQuery("scan")),
        )
    ),
    "q_not": A.BooleanQuery(
        ((A.Occur.MUST, A.TermQuery("table")), (A.Occur.MUST_NOT, A.TermQuery("merge")))
    ),
    "q_phrase": A.PhraseQuery(("table", "hash")),
    "q_sloppy": A.PhraseQuery(("table", "hash"), slop=3),
    "q_dismax": A.DisjunctionMaxQuery((A.TermQuery("table"), A.TermQuery("merge")), 0.3),
    "q_wildcard": A.WildcardQuery("*ow"),
    "q_field_filter": A.BooleanQuery(
        ((A.Occur.MUST, A.TermQuery("table")), (A.Occur.FILTER, A.FieldValueQuery("lang", "en")))
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)

    from lucene_spark.gate import corpus_df
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search.engine import Searcher
    from lucene_spark.session import get_spark

    t_all = time.time()
    spark = get_spark("bench", master=f"local[{cpus}]")
    idx_dir = f"/tmp/lucene_spark_bench/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(idx_dir, ignore_errors=True)

    corpus = corpus_df(spark, sf_dir)
    t0 = time.time()
    cfg = IndexConfig(docs_per_chunk=1 << 12, term_buckets=8, positions=True)
    metrics = IndexBuilder(spark, cfg).build(corpus, idx_dir, assign_ids=False)
    build_sec = time.time() - t0
    n_docs = metrics["docs"]

    searcher = Searcher(SearchIndex(spark, idx_dir))
    # warm-up: touch all tables + JIT the kernels
    for q in QUERIES.values():
        searcher.search(q, k=10)

    lat: dict[str, float] = {}
    for name, q in QUERIES.items():
        times = []
        for _ in range(5):
            t0 = time.time()
            searcher.search(q, k=10)
            times.append(time.time() - t0)
        lat[name] = round(statistics.median(times), 4)

    total = time.time() - t_all
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query p50 (documents corpus)",
                "value": round(total, 2),
                "unit": "sec",
                "queries": lat,
                "sf": sf,
                "build_sec": round(build_sec, 2),
                "docs_per_sec": round(n_docs / build_sec, 1),
                "n_docs": n_docs,
                "query_p50_sec": round(statistics.median(lat.values()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
