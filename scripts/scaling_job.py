#!/usr/bin/env python
"""The spark-submit job used for the N vs 4N scaling evidence.

Reads the cached deterministic corpus (generating it on first use), runs the
full extraction pipeline with an aggregate sink, prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ocrspark.corpus import generate_docs  # noqa: E402
from ocrspark.pipeline import extract  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = SparkSession.builder.appName("ocrspark-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores * 2))

    cache = REPO / ".bench_cache" / f"docs_n{n_docs}_s42"
    if not (cache / "_SUCCESS").exists():
        generate_docs(spark, n_docs, seed=42, fat_doc_rate=0.001,
                      partitions=128).write.mode("overwrite").parquet(str(cache))
    docs = spark.read.parquet(str(cache))
    # Warm the JVM (C2-compiles the codegen'd pipeline) on a 20% hash slice —
    # same plan shape, untimed.  Without this the measurement is dominated by
    # JIT warmup, which a long-running cluster job amortizes to zero.
    warm = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0)
    extract(warm).agg(F.sum(F.size("spans"))).collect()

    t0 = time.time()
    row = extract(docs).agg(
        F.sum(F.size("spans")).alias("n_spans"), F.count(F.lit(1)).alias("n_tasks")
    ).collect()[0]
    wall = time.time() - t0

    print(json.dumps({
        "parallelism": cores,
        "wall_sec": round(wall, 2),
        "n_docs": n_docs,
        "n_tasks": row.n_tasks,
        "n_spans": int(row.n_spans),
        "docs_per_sec": round(n_docs / wall, 1),
        "spans_per_sec": round(int(row.n_spans) / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
