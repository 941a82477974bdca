"""Batch checkpoint/resume with per-bucket lineage + metrics.

Replaces the reference's ``progress.json`` status lines
(/root/reference/scripts/utils.py:22-66, polled by the GUI in
app/App.cpp:460-586) with a durable checkpoint table: one row per completed
doc-bucket carrying lineage (run id, input snapshot) and metrics (doc / task /
span counts).

Resume semantics: work is partitioned into ``buckets`` by hash(doc_id)
(Iceberg ``bucket(N, doc_id)`` parity) and processed in ``batches`` groups of
buckets.  Each batch is one Spark job: filter -> extract -> idempotent
per-bucket overwrite -> checkpoint append.  On restart, completed buckets are
anti-joined away and only pending buckets run; a re-run of a completed bucket
is harmless (same deterministic output, dynamic-partition overwrite).

At cluster scale, batches bound the blast radius of a failure to one batch's
work while keeping the job count low (buckets=1024, batches~32).
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_BUCKETS
from .partitioning import with_bucket
from .pipeline import extract


def completed_buckets(spark: SparkSession, store) -> set[int]:
    cps = store.read_checkpoints(spark)
    if cps is None:
        return set()
    return {r.bucket for r in cps.select("bucket").distinct().collect()}


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    store,
    buckets: int = DEFAULT_BUCKETS,
    batches: int = 4,
    max_batches: int | None = None,
    run_id: str | None = None,
    input_snapshot_id: str = "",
    arrow: bool = False,
) -> dict:
    """Process all pending buckets; returns a summary dict.

    ``max_batches`` exists for tests (simulate a killed run by stopping
    after a prefix of batches).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    done = completed_buckets(spark, store)
    pending = [b for b in range(buckets) if b not in done]
    if not pending:
        return {"run_id": run_id, "batches_run": 0, "buckets_done": sorted(done)}

    docs_b = with_bucket(docs, buckets)
    per_batch = max(1, math.ceil(len(pending) / batches))
    groups = [pending[i:i + per_batch] for i in range(0, len(pending), per_batch)]
    if max_batches is not None:
        groups = groups[:max_batches]

    ran = 0
    for group in groups:
        batch_docs = docs_b.filter(F.col("bucket").isin(group))
        out = extract(batch_docs.select("doc_id", "spans"), arrow=arrow)
        # Persist the batch once: the sink write and the metrics agg both
        # consume the cached rows.  (A per-batch read-back of the whole
        # extractions table is O(batches) full scans, and IcebergStore's
        # bucket(N, doc_id) partition transform cannot prune a filter on a
        # re-derived xxhash64 bucket column.)
        out = with_bucket(out, buckets).persist()
        try:
            store.write_extractions(out)
            stats = out.groupBy("bucket").agg(
                F.countDistinct("doc_id").alias("doc_count"),
                F.count(F.lit(1)).alias("task_count"),
                F.sum(F.size("spans")).alias("span_count"),
            )
            # buckets that held zero docs still need a checkpoint row
            all_rows = spark.createDataFrame(
                [(b,) for b in group], "bucket int"
            ).join(stats, "bucket", "left").fillna(
                0, ["doc_count", "task_count", "span_count"]
            )
            # landed_task_count = what is durably IN the store for these
            # buckets (partition-pruned read-back), vs task_count = what was
            # computed.  NULL = store can't verify cheaply (IcebergStore:
            # transactional MERGE; snapshot metrics are the evidence there).
            landed = store.landed_per_bucket(spark, group) if hasattr(
                store, "landed_per_bucket") else None
            if landed is not None:
                all_rows = all_rows.join(landed, "bucket", "left").fillna(
                    0, ["landed_task_count"]
                )
            else:
                all_rows = all_rows.withColumn(
                    "landed_task_count", F.lit(None).cast("long")
                )
            cp = all_rows.select(
                F.lit(run_id).alias("run_id"),
                F.col("bucket"),
                F.col("doc_count").cast("long"),
                F.col("task_count").cast("long"),
                F.col("span_count").cast("long"),
                F.col("landed_task_count").cast("long"),
                F.lit(input_snapshot_id).alias("input_snapshot_id"),
                F.current_timestamp().alias("completed_at"),
            )
            store.append_checkpoints(cp)
        finally:
            out.unpersist()
        ran += 1

    return {
        "run_id": run_id,
        "batches_run": ran,
        "buckets_done": sorted(done | {b for g in groups for b in g}),
    }
