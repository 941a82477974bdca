"""S6/J2 manual-override and alias tables (small broadcast inputs).

The reference reads control files per run: ``subject.json`` manual subject
codes (/root/reference/scripts/task_processing.py:226-232) and the catalog's
alias map resolving any known alternate code to its canonical subject key
(scripts/object_handling.py:30-51).  In batch form both are small lookup
tables broadcast-joined against the extractions (J2 pattern) — never a
shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_aliases(extractions: DataFrame, alias: DataFrame) -> DataFrame:
    """J2: replace ``subject`` with its canonical key where an alias matches.

    ``alias``: (alias_code string, canonical string).  Matching is on the
    normalized code (upper/trim, object_handling.py:10-12); unmatched
    subjects pass through unchanged (resolve_subject_code returns None ->
    caller keeps the detected code).
    """
    a = alias.select(
        F.upper(F.trim(F.col("alias_code"))).alias("_alias_code"),
        F.col("canonical").alias("_canonical"),
    )
    joined = extractions.join(
        F.broadcast(a),
        F.upper(F.trim(extractions["subject"])) == a["_alias_code"],
        "left",
    )
    return joined.withColumn(
        "subject", F.coalesce(F.col("_canonical"), F.col("subject"))
    ).drop("_alias_code", "_canonical")


def apply_subject_overrides(extractions: DataFrame,
                            overrides: DataFrame) -> DataFrame:
    """S6: per-doc manual subject override (subject.json semantics — the
    manual code wins over the detected one when present).

    ``overrides``: (doc_id string, subject_override string).
    """
    o = overrides.select(
        "doc_id", F.col("subject_override").alias("_subject_override")
    )
    joined = extractions.join(F.broadcast(o), "doc_id", "left")
    return joined.withColumn(
        "subject",
        F.coalesce(
            F.upper(F.trim(F.col("_subject_override"))), F.col("subject")
        ),
    ).drop("_subject_override")
