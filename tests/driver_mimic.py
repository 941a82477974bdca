"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB over the same sf dir; compare row
multisets (columns sorted by name, values stringified).

Usage: python tests/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ocrspark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def duckdb_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_one(spark, con, name, fn, oracles, sf_dir):
    """Run ONE queries() entry vs its oracle the way the driver does.
    Returns (ok: bool, detail: str) — rows-only entries (no oracle)
    count as ok with a 'rows-only' detail."""
    df = fn(spark, sf_dir)
    srows = df.collect()
    scols = df.columns
    if name not in oracles:
        return True, f"rows-only: {len(srows)} rows"
    rel = con.sql(oracles[name])
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    if sorted(scols) != sorted(dcols):
        return False, (f"SCHEMA MISMATCH spark={sorted(scols)} "
                       f"duck={sorted(dcols)}")
    a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
    if a == b:
        return True, f"OK ({len(a)} rows)"
    detail = f"MISMATCH spark={len(a)} duck={len(b)}"
    for x, y in zip(a, b):
        if x != y:
            detail += f"\n   spark: {x}\n   duck : {y}"
            break
    return False, detail


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    con = duckdb_con(sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, detail = compare_one(spark, con, name, fn, oracles, sf_dir)
        except Exception as e:
            ok, detail = False, f"ERROR: {str(e)[:200]}"
        if not ok:
            failures += 1
        print(f"{name:34s} {detail}")
    print("failures:", failures)
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
