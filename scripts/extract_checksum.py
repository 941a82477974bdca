#!/usr/bin/env python
"""Order-independent checksum of extract()'s full output on the bench corpus.

Used to prove optimization steps output-identical at sf scale (the oracle
checks sf0.001/sf0.01; this covers the 60k-doc bench corpus too).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ocrspark.pipeline import extract  # noqa: E402
from ocrspark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("OCRSPARK_CHECK_N", "60000"))
    arrow = bool(os.environ.get("OCRSPARK_CHECK_ARROW"))
    os.environ.setdefault("OCRSPARK_DRIVER_MEM", "48g")
    spark = get_spark(app="extract-checksum", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    cache = REPO / ".bench_cache" / f"docs_n{n}_s42_v2"
    docs = spark.read.parquet(str(cache))
    out = extract(docs, arrow=arrow)
    row = out.select(
        F.xxhash64(*[F.col(c) for c in out.columns]).alias("h"),
        F.crc32(F.to_json(F.struct(*out.columns))).alias("j"),
    ).agg(
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        F.count(F.lit(1)).alias("rows"),
        F.sum("j").alias("jsum"),
    ).collect()[0]
    print(f"rows={row['rows']} hsum={row['hsum']} jsum={row['jsum']}")
    spark.stop()


if __name__ == "__main__":
    main()
