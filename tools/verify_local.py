"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01, runs its ``oracle_sql()`` twin
in DuckDB over the same parquet tables, and compares row count, column
names, and an order-insensitive value hash. Rows-only queries are
executed and row-counted.

Usage: python tools/verify_local.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    from data_ingestion_tool_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only, {len(srows)} rows, {dt:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a sample diff
                sset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                dset = {
                    "|".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"        spark-only: {x[:160]}")
                for x in list(dset - sset)[:3]:
                    print(f"        duck-only:  {x[:160]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
        else:
            print(f"PASS  {name}: {len(srows)} rows, {dt:.1f}s")
    print(
        f"\n{len(failures)} failures / {len(only) if only else len(qs)} run"
        + (f": {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
