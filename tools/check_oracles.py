"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 AND its oracle_sql() on DuckDB, compare row count,
column names, and an order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        srows_t = [tuple(r[c] for c in scols) for r in srows]
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        elif len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        else:
            hs = table_hash(scols, srows_t)
            ho = table_hash(ocols, orows)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash" in problems[0]:
                _show_diff(scols, srows_t, ocols, orows)
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
    spark.stop()
    return 1 if n_fail else 0


def _show_diff(scols, srows, ocols, orows, limit=4):
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = {tuple(norm_cell(r[i]) for i in order_s) for r in srows}
    oset = {tuple(norm_cell(r[i]) for i in order_o) for r in orows}
    print("      cols:", [scols[i] for i in order_s])
    for r in list(sset - oset)[:limit]:
        print("      spark-only:", r)
    for r in list(oset - sset)[:limit]:
        print("      duck-only: ", r)


if __name__ == "__main__":
    raise SystemExit(main())
