"""Index inspection CLI — the lucene/luke module's overview role
(org.apache.lucene.luke.app; the reference ships a GUI for browsing an
index's fields, top terms, and per-segment statistics — this is the
headless, scriptable equivalent over the parquet index layout).

Usage:
  python scripts/inspect_index.py /path/to/index [--top-terms N] [--field F]

Prints one JSON document: manifest summary, collection statistics per
field, doc-id bounds, table sizes, and the top-N terms by document
frequency (the Luke "Top ranking terms" panel).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--top-terms", type=int, default=15)
    ap.add_argument("--field", default=None, help="scope top terms to a tokenized field")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lucene_spark.index.builder import FIELD_SEP
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.session import get_spark

    spark = get_spark("inspect_index")
    ix = SearchIndex(spark, args.index_dir)
    m = ix._manifest
    max_doc, n_docs, contiguous = ix.doc_id_bounds

    ts = ix.term_stats_df
    if args.field and args.field != ix.primary_field:
        prefix = args.field + FIELD_SEP
        ts = ts.filter(F.col("term").startswith(prefix)).withColumn(
            "term", F.col("term").substr(F.lit(len(prefix) + 1), F.length("term"))
        )
    else:
        ts = ts.filter(~F.col("term").contains(FIELD_SEP))
    top = [
        {"term": r["term"], "df": int(r["df"]), "ttf": int(r["ttf"])}
        for r in ts.orderBy(F.desc("df"), F.asc("term")).limit(args.top_terms).collect()
    ]

    report = {
        "index_dir": args.index_dir,
        "analyzer": ix.analyzer,
        "fields": list(ix.text_fields),
        "max_doc": max_doc,
        "n_docs": n_docs,
        "contiguous_ids": contiguous,
        "stats": {
            f: {
                "doc_count": ix.stats_for(f).doc_count,
                "sum_ttf": ix.stats_for(f).sum_total_term_freq,
            }
            for f in ix.text_fields
        },
        "vocab": m.get("vocab"),
        "docs_per_chunk": m.get("docs_per_chunk"),
        "index_sort": m.get("index_sort", []),
        "build": {k: m.get(k) for k in ("elapsed_sec", "docs_per_sec", "phase_sec") if k in m},
        "top_terms": top,
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
