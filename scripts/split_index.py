"""IndexSplitter CLI (org.apache.lucene.misc.index.IndexSplitter main
role — the reference ships it as a command-line tool).

Usage:
  python scripts/split_index.py /path/to/index CUT /out/lo /out/hi

CUT must be a multiple of the index's docs_per_chunk (the segment
boundary). Docs [0, CUT) land in /out/lo with unchanged ids; docs
[CUT, maxDoc) land in /out/hi rebased to 0. Prints one JSON line with
the per-half doc counts. Cluster form: spark-submit --py-files
lucene_spark.zip scripts/split_index.py ...
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(index_dir: str, cut: str, out_lo: str, out_hi: str) -> int:
    from lucene_spark.index.split import split_index
    from lucene_spark.session import get_spark

    spark = get_spark("split_index")
    n_lo, n_hi = split_index(spark, index_dir, int(cut), out_lo, out_hi)
    print(json.dumps({"lo": {"dir": out_lo, "docs": n_lo}, "hi": {"dir": out_hi, "docs": n_hi}}))
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 5:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:]))
