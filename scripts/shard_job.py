#!/usr/bin/env python
"""One 'executor' of the multi-executor simulation: run the extraction
pipeline over a disjoint hash shard of the cached corpus."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ocrspark.pipeline import extract  # noqa: E402


def main() -> None:
    n_docs, shard, n_shards = (int(a) for a in sys.argv[1:4])
    spark = SparkSession.builder.appName(f"ocrspark-shard-{shard}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores * 2))

    docs = spark.read.parquet(str(REPO / ".bench_cache" / f"docs_n{n_docs}_s42_v2"))
    if n_shards > 1:
        docs = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)) == shard)
    # small untimed warmup (same plan shape)
    warm = docs.filter(F.pmod(F.xxhash64(F.concat(F.lit("w"), F.col("doc_id"))), F.lit(6)) == 0)
    extract(warm).agg(F.sum(F.size("spans")),
                      F.sum(F.length("task_text_html"))).collect()

    t0 = time.time()
    # html/merged sums keep the topic/HTML/G7 stages in the timed plan
    row = extract(docs).agg(
        F.sum(F.size("spans")).alias("n_spans"),
        F.count(F.lit(1)).alias("n_tasks"),
        F.sum(F.length("task_text_html")).alias("html_chars"),
        F.sum(F.col("was_merged").cast("int")).alias("n_merged"),
    ).collect()[0]
    wall = time.time() - t0
    n = docs.count()
    print(json.dumps({"shard": shard, "n_docs": n, "wall_sec": round(wall, 2),
                      "n_spans": int(row.n_spans or 0)}))
    spark.stop()


if __name__ == "__main__":
    main()
