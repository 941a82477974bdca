"""Stage 3: ordered span reassembly (higher-order functions, no UDF).

Output contract per task (FIXTURES.md section 4; web/OCRacle.html:283-310
renders images before the task text):

  spans = images (input-offset order) ++ texts (input-offset order),
  each text: label-strip (marker span only) -> admin-strip -> math-normalize,
  text spans empty after the chain are dropped, offsets re-based 0..n-1.

Everything happens inside array lambdas on the one-row-per-doc aggregates —
no join, no extra shuffle; the final explode fans back out to one row per
(doc_id, task_number).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import config as C
from . import rules


def _transform_text(x: Column) -> Column:
    base = F.when(x["is_marker"], rules.strip_label(x["text"])).otherwise(x["text"])
    return rules.normalize_math(rules.strip_admin(base))


def output_spans(sp: Column) -> Column:
    """sp: offset-sorted array<struct<offset,kind,text,media_ref,is_marker>>."""
    images = F.filter(sp, lambda x: x["kind"] == C.IMAGE_KIND)
    texts = F.filter(sp, lambda x: x["kind"] == C.TEXT_KIND)
    ordered = F.concat(images, texts)
    transformed = F.transform(
        ordered,
        lambda x: F.struct(
            x["kind"].alias("kind"),
            _transform_text(x).alias("text"),
            x["media_ref"].alias("media_ref"),
        ),
    )
    nonempty = F.filter(
        transformed,
        lambda x: ~((x["kind"] == C.TEXT_KIND) & (x["text"] == "")),
    )
    return F.transform(
        nonempty,
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def assemble(segmented: DataFrame) -> DataFrame:
    """Per-doc task arrays -> extractions(doc_id, subject, exam_version,
    task_number, points, topic, task_text, task_text_html, was_merged,
    spans).

    Text-level outputs (topic/task_text/html) follow the reference's task
    chain (P8 identity -> P12 strip -> T1-T5 normalize -> P11 topic -> P13
    HTML); the span array stays the span-level truth (north-rule invariant).
    Whole-stage codegen CSE shares the repeated span-chain subexpressions.
    """
    exploded = segmented.select(
        "doc_id", "subject", "exam_version", "source_subject_code",
        F.explode("tasks").alias("t")
    )
    task_text = rules.normalize_math(
        rules.strip_admin(rules.strip_label(F.col("t.task_text_raw")))
    )
    out = exploded.select(
        "doc_id",
        "subject",
        "exam_version",
        "source_subject_code",
        F.col("t.task_number").alias("task_number"),
        F.col("t.points").alias("points"),
        task_text.alias("task_text"),
        F.col("t.was_merged").alias("was_merged"),
        output_spans(F.col("t.sp")).alias("spans"),
    )
    para_sources = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == C.TEXT_KIND),
        lambda s: s["text"],
    )
    return out.select(
        "doc_id",
        "subject",
        "exam_version",
        "source_subject_code",
        "task_number",
        "points",
        rules.classify_topic(F.col("task_text")).alias("topic"),
        "task_text",
        rules.format_html(para_sources, F.col("points")).alias("task_text_html"),
        "was_merged",
        "spans",
    )
