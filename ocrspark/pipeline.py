"""End-to-end extraction pipeline: stage1 -> segment -> assemble.

Single logical plan, one data-sized exchange (hash(doc_id) for the
sessionization window); everything downstream reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .assemble import assemble
from .segment import segment
from .stage1 import stage1


def extract(docs: DataFrame, arrow: bool = False, merge: bool = True) -> DataFrame:
    """docs(doc_id, spans) -> extractions(doc_id, subject, exam_version,
    task_number, points, topic, task_text, task_text_html, was_merged,
    spans).  ``merge`` toggles the G7 short-task repair (default on)."""
    flat = stage1(docs, arrow=arrow)
    return assemble(segment(flat, merge=merge))
