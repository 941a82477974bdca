"""Catalog output shape: the reference's nested JSON contract.

The reference persists `subject -> {alternate_codes, topics, exams ->
{version -> {source_subject_code, tasks: [...]}}}`
(/root/reference/scripts/object_handling.py:15-29; sample
/root/reference/exams.json).  This module rebuilds that consumable shape
from the flat extractions table:

* task ordering inside an exam = numeric-first sort key
  (object_handling.py:241-246 `_sort_key`: first integer, ties by string) —
  W6/W7 in SURVEY.md;
* task_text = the task's text spans joined (the viewer renders images before
  the text from media refs, web/OCRacle.html:283-310, so text-only here);
* alternate_codes = order-preserving dedup of observed source codes minus
  the canonical one (object_handling.py:88-101 set-merge semantics).

All native expressions; one row per (subject, exam_version) with a nested
tasks array, or `to_json_catalog` for the exact JSON document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _task_sort_key(task_number):
    num = F.regexp_extract(task_number, "[0-9]+", 0)
    return F.when(num != "", num.cast("int")).otherwise(F.lit(2**31 - 1))


def exams_catalog(extractions: DataFrame) -> DataFrame:
    """extractions -> one row per (subject, exam_version) with ordered tasks."""
    task_text = F.array_join(
        F.transform(
            F.filter(F.col("spans"), lambda s: (s["kind"] == "text") & (s["text"] != "")),
            lambda s: s["text"],
        ),
        " ",
    )
    media_refs = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == "image"),
        lambda s: s["media_ref"],
    )
    tasks = extractions.select(
        "subject",
        "exam_version",
        F.struct(
            _task_sort_key(F.col("task_number")).alias("_k"),
            F.col("task_number").alias("task_number"),
            F.col("points").alias("points"),
            task_text.alias("task_text"),
            media_refs.alias("media_refs"),
        ).alias("t"),
    )
    per_exam = tasks.groupBy("subject", "exam_version").agg(
        F.transform(
            F.array_sort(F.collect_list("t")),
            lambda t: t.dropFields("_k"),
        ).alias("tasks")
    )
    return per_exam


def to_json_catalog(extractions: DataFrame) -> DataFrame:
    """One JSON document per subject (the exams.json outer shape)."""
    per_exam = exams_catalog(extractions)
    per_subject = per_exam.groupBy("subject").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("exam_version"), F.col("tasks")))
            )
        ).alias("exams")
    )
    return per_subject.select(
        "subject",
        F.to_json(F.struct(F.col("exams"))).alias("catalog_json"),
    )
