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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as e:
            print(f"{name:34s} SPARK ERROR: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:34s} rows-only: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"{name:34s} ORACLE ERROR: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"{name:34s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
        if a == b:
            print(f"{name:34s} OK ({len(a)} rows)")
        else:
            failures += 1
            print(f"{name:34s} MISMATCH spark={len(a)} duck={len(b)}")
            for x, y in zip(a, b):
                if x != y:
                    print("   spark:", x)
                    print("   duck :", y)
                    break
    print("failures:", failures)
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
