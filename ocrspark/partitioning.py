"""Skew-aware partitioning helpers (north star: "salted repartitioning on
doc_id to absorb skew from oversized exam PDFs").

Where skew can bite, and the mitigation used:

* stage-1 narrow work (explode + recovery + rule columns): a fat doc's spans
  all sit in whatever input split held the doc.  ``salted_repartition``
  spreads them over ``salt`` sub-keys — safe because stage 1 is per-span.
* the sessionization window shuffles on doc_id — inherently per-doc (the
  running-max/cumsum needs the whole doc in order).  A 100k-span doc is
  ~10 MB in one partition: bounded, same whole-document state the reference
  holds in Python lists.  AQE handles residual partition imbalance.
* output bucketing: ``with_bucket`` adds the Iceberg-style
  ``bucket(N, doc_id)`` partition column used for checkpointed writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT_BUCKETS


def salted_repartition(flat: DataFrame, partitions: int, salt: int = 16) -> DataFrame:
    """Spread per-span narrow work evenly, breaking fat-doc locality."""
    return flat.repartition(
        partitions, F.col("doc_id"), F.pmod(F.xxhash64("offset"), F.lit(salt))
    )


def bucket_of(col, buckets: int = DEFAULT_BUCKETS):
    """Deterministic doc bucket: pmod(xxhash64(doc_id), N) — the parquet
    fallback's stand-in for Iceberg's bucket(N, doc_id) transform."""
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def with_bucket(df: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn("bucket", bucket_of(F.col("doc_id"), buckets))


def write_bucketed(df: DataFrame, table: str, key: str = "doc_id",
                   buckets: int = DEFAULT_BUCKETS) -> None:
    """Persist as a Spark bucketed+sorted table so later equi-joins and
    aggregations on ``key`` are exchange-free.

    This is the co-located-join path for 100 TB: two tables bucketed by
    the same key with the same bucket count sort-merge-join with ZERO
    shuffle of either side (asserted in test_plan) — the join that
    dominates repeated pipeline runs (extractions x catalog, spans x
    tasks) is paid once at write time instead of per query.
    """
    (df.write.mode("overwrite").format("parquet")
       .bucketBy(buckets, key).sortBy(key).saveAsTable(table))
