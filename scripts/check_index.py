"""CheckIndex CLI (org.apache.lucene.index.CheckIndex main role).

Usage: python scripts/check_index.py /path/to/index
Exit 0 = clean; 1 = corruption found (report printed either way).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(index_dir: str) -> int:
    from lucene_spark.index.check import check_index
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.session import get_spark

    spark = get_spark("check_index")
    report = check_index(SearchIndex(spark, index_dir), raise_on_failure=False)
    print(json.dumps(report, indent=2))
    return 0 if report["status"] == "ok" else 1


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
