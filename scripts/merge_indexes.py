"""IndexMergeTool CLI (org.apache.lucene.misc.IndexMergeTool main
role — "Merges indices in DIRS into DEST"; the reference ships it as
a command-line tool over IndexWriter.addIndexes).

Usage:
  python scripts/merge_indexes.py [--mode merge|copy] [--out OUT] DEST SRC [SRC ...]

Modes (see lucene_spark.index.addindexes):
  merge  addIndexes(CodecReader...): one term-keyed shuffle, output
         table-identical to a one-shot build over the union (default,
         like IndexMergeTool's writer.addIndexes + forceMerge(1)).
  copy   addIndexes(Directory...): zero-shuffle tier append — each SRC
         becomes a new postings/term_stats tier via a map-only doc-id
         re-encode.

In-place on DEST unless --out is given. Prints one JSON line with the
merge metrics. Cluster form: spark-submit --py-files lucene_spark.zip
scripts/merge_indexes.py ...
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> int:
    mode, out = "merge", None
    args: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--mode":
            mode = next(it, "")
        elif a == "--out":
            out = next(it, None)
        else:
            args.append(a)
    if len(args) < 2 or mode not in ("merge", "copy"):
        print(__doc__)
        return 2
    from lucene_spark.index.addindexes import add_indexes
    from lucene_spark.session import get_spark

    spark = get_spark("merge_indexes")
    metrics = add_indexes(spark, args[0], args[1:], out_dir=out, mode=mode)
    print(
        json.dumps(
            {
                "dest": out or args[0],
                "mode": mode,
                "docs": metrics["docs"],
                "added_docs": metrics["added_docs"],
                "doc_bases": metrics["doc_bases"],
                "elapsed_sec": metrics["elapsed_sec"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
