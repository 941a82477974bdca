#!/usr/bin/env python
"""Opt-in stage-isolation profiler for the extraction pipeline (guide §1.4).

NOT the frozen driver bench (bench.py) — this exists to attribute the
extract-family seconds to pipeline stages with noop sinks, so optimization
targets the stage that actually burns the time.

Usage: python bench_extra.py [--stages ...] [--rounds N]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
Prints one JSON line: {"stages": {name: [sec,...]}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ocrspark import assemble as A  # noqa: E402
from ocrspark import segment as S  # noqa: E402
from ocrspark.ops import dedup, similarity, textstats  # noqa: E402
from ocrspark.pipeline import extract  # noqa: E402
from ocrspark.session import get_spark  # noqa: E402
from ocrspark.stage1 import stage1  # noqa: E402

DOCS_PER_SF = 600_000


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re as _re
    m = _re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    os.environ.setdefault("OCRSPARK_DRIVER_MEM", "48g")
    spark = get_spark(app="ocrspark-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    n = max(2000, int(DOCS_PER_SF * sf))
    cache = REPO / ".bench_cache" / f"docs_n{n}_s42_v2"
    docs = spark.read.parquet(str(cache))
    docs.count()

    def tbl(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    stages = {
        "scan": lambda: noop(docs),
        "stage1": lambda: noop(stage1(docs)),
        "sessionize": lambda: noop(S.sessionize(stage1(docs))),
        "agg_tasks": lambda: noop(S.aggregate_tasks(S.sessionize(stage1(docs)))),
        "nest": lambda: noop(
            S.nest_per_doc(S.aggregate_tasks(S.sessionize(stage1(docs))))),
        "segment": lambda: noop(S.segment(stage1(docs))),
        "extract": lambda: noop(extract(docs)),
        "extract_arrow": lambda: noop(extract(docs, arrow=True)),
        "minhash": lambda: dedup.minhash_dedup(tbl("documents"), threshold=0.2).count(),
        "simhash": lambda: dedup.simhash(tbl("documents")).count(),
        "cosine": lambda: similarity.cosine_topk(tbl("embeddings")).count(),
        "text_stats": lambda: textstats.quality_score(tbl("documents"))
        .join(textstats.token_stats(tbl("documents")), "doc_id").count(),
    }
    if args.stages:
        stages = {k: v for k, v in stages.items() if k in args.stages}

    runs: dict[str, list[float]] = {k: [] for k in stages}
    # warmup pass on a 20% slice for JIT, mirroring bench.py's protocol
    warm = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0)
    if any(k in stages for k in ("extract", "segment", "nest", "agg_tasks")):
        noop(extract(warm))
    if "extract_arrow" in stages:
        noop(extract(warm, arrow=True))
    for _ in range(args.rounds):
        for name, fn in stages.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))
    print(json.dumps({"stages": runs, "sf": sf, "n_docs": n,
                      "parallelism": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
