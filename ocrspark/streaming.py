"""Structured Streaming surface.

The extraction engine itself is batch (the reference is a batch job per
document; resumability is checkpointed batch, SURVEY.md section 2.10).  The
streaming module covers the ingestion side a live corpus would need:

* ``stream_extract`` — the SAME extraction pipeline bound to a file-source
  stream of span-table parquet: Structured Streaming replays the identical
  logical plan per micro-batch (foreachBatch), reusing the batch writer, so
  the batch/streaming split costs no second implementation.
* ``windowed_event_counts`` — watermarked sliding-window aggregation over an
  event stream (late-data handling demo on the driver's `events` shape).

Both run under ``trigger(availableNow=True)`` in tests (bounded drain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract
from .schema import DOCS_SCHEMA


def stream_extract(spark: SparkSession, input_dir: str, out_dir: str,
                   checkpoint_dir: str):
    """File-source streaming extraction: each micro-batch of new doc files
    runs the batch pipeline and appends to the output parquet."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        extract(batch_df).write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          slide: str | None = None,
                          watermark: str = "30 minutes") -> DataFrame:
    """Watermarked (sliding) window counts per event_type.

    ``events`` may be a streaming DataFrame (readStream) or batch — the same
    expression works for both (batch ignores the watermark).
    """
    # cast first, watermark second, and reference the *watermarked* column
    # bare inside window() — any further cast strips the event-time tag
    df = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    ts = F.col("ts")
    w = F.window(ts, window, slide) if slide else F.window(ts, window)
    return df.groupBy(w.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
