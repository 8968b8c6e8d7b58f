"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares:
row count, sorted-by-name column list, and an order-insensitive value hash.
Floats are canonicalized via repr of float64; query authors should make
aggregates deterministic (decimal casts) so engines agree bit-for-bit.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in col_order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from fstore_sql_spark import get_spark

    spark = get_spark(app_name="correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dataset directory
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    ok = fail = skipped = 0
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [c.lower() for c in sdf.columns]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only): {len(srows)} rows  [{t_spark:.1f}s]")
            skipped += 1
            continue
        try:
            cur = con.execute(oracles[name])
            drows = cur.fetchall()
            dcols = [d[0].lower() for d in cur.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            s_order = [scols.index(c) for c in sorted(scols)]
            d_order = [dcols.index(c) for c in sorted(dcols)]
            sh = value_hash(srows, s_order)
            dh = value_hash(drows, d_order)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show a few differing lines to debug
                sset = {
                    "\x1f".join(canon(r[i]) for i in s_order) for r in srows
                }
                dset = {
                    "\x1f".join(canon(r[i]) for i in d_order) for r in drows
                }
                for line in list(sset - dset)[:3]:
                    print(f"        spark-only: {line[:200]}")
                for line in list(dset - sset)[:3]:
                    print(f"        duck-only:  {line[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows  [{t_spark:.1f}s]")
            ok += 1

    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only, of {len(names)}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
