"""Observed metrics (S9/A4 parity): the reference's progress fractions
(/root/reference/scripts/utils.py:48-66) become ``df.observe`` counters that
ride the job for free — no extra pass, no accumulator plumbing.

Usage::

    obs, df = observed(extract(docs))
    df.write...            # run the job
    obs.get                # {'docs': ..., 'tasks': ..., 'spans': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(extractions: DataFrame) -> tuple[Observation, DataFrame]:
    obs = Observation("ocrspark_extract")
    df = extractions.observe(
        obs,
        # DISTINCT aggregates are not allowed in observed metrics; HLL is.
        F.approx_count_distinct("doc_id").alias("docs"),
        F.count(F.lit(1)).alias("tasks"),
        F.sum(F.size("spans")).alias("spans"),
        F.sum(F.col("points")).alias("points_total"),
        F.sum(F.col("was_merged").cast("int")).alias("merged_tasks"),
    )
    return obs, df
