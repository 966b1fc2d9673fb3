"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given sf_dir, runs
the paired oracle_sql() in DuckDB over the same parquet tables, and
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified). Score
columns are rounded to 2dp on BOTH sides by the gate queries
themselves; a float32-vs-float64 straddle of a rounding boundary
would surface here as a value-hash mismatch.

Usage: python scripts/check_gate.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm_rows = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in norm_rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from lucene_spark.session import get_spark

    spark = get_spark("check_gate")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if any(k.startswith(p) for p in only)}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        status = []
        if name not in oracles:
            status.append(f"rows-only ({len(srows)} rows)")
            print(f"  {name:28s} {time.time()-t0:6.1f}s  {'; '.join(status)}")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = [tuple(r) for r in ores.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  {name:28s} ORACLE SQL ERROR: {e}")
            continue
        ok = True
        if len(srows) != len(orows):
            ok = False
            status.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            status.append(f"SCHEMA spark={scols} oracle={ocols}")
        if ok:
            hs, ho = value_hash(srows, scols), value_hash(orows, ocols)
            if hs != ho:
                ok = False
                status.append("VALUE-HASH MISMATCH")
                idx = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {tuple(_norm(r[i]) for i in idx) for r in srows}
                oset = {tuple(_norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                for d in sorted(sset - oset)[:3]:
                    status.append(f"spark-only={d}")
                for d in sorted(oset - sset)[:3]:
                    status.append(f"oracle-only={d}")
        mark = "OK" if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"  {name:28s} {time.time()-t0:6.1f}s  {mark} {'; '.join(status)}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match", f"FAILURES: {failures}" if failures else "")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            only=sys.argv[2:] or None,  # optional gate-key prefixes
        )
    )
