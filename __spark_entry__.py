"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`lucene_spark.gate`, which holds the real
implementations: engine-backed gate queries and their DuckDB oracle
SQL re-derivations (full BM25 pipeline in SQL, SmallFloat decode table
inline). See lucene_spark/gate.py for the fidelity notes.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lucene_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gate.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data pipeline operators). Column names/types are aligned
    with ``oracle_sql`` per the driver's hash-compare contract."""
    return gate.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each gate query (keys without an entry
    get the weaker rows-only check)."""
    return gate.oracle_sql()
