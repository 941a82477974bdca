"""Differential test: Spark pipeline == pyref spec on the synthetic corpus.

The generator (ocrspark.corpus) produces every noise class in FIXTURES.md
section 2 — leading/trailing admin pseudo-tasks, degenerate short tasks,
solution sections, stray 'Maks poeng' containers, stutter, unicode math,
variant subject codes — so this covers all drop/strip/renumber paths.
"""

import pytest
from pyspark.sql import functions as F

from ocrspark.corpus import expected_extractions, generate_docs
from ocrspark.pipeline import extract

N_DOCS = 80


def _canon(df):
    return df.select(
        "doc_id", "subject", "exam_version", "source_subject_code",
        "task_number", "points",
        "topic", "task_text", "task_text_html", "was_merged",
        F.to_json("spans").alias("spans_json"),
    )


@pytest.mark.parametrize("seed", [42, 7])
def test_corpus_differential(spark, seed):
    docs = generate_docs(spark, N_DOCS, seed=seed)
    got = _canon(extract(docs))
    exp = _canon(expected_extractions(spark, N_DOCS, seed=seed))
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_partitioning_invariance(spark):
    """Result is independent of input partitioning (order never implicit)."""
    docs = generate_docs(spark, 20, seed=13)
    a = _canon(extract(docs.repartition(1)))
    b = _canon(extract(docs.repartition(16, "doc_id")))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_arrow_native_stage1_agree(spark):
    docs = generate_docs(spark, 20, seed=99)
    a = _canon(extract(docs, arrow=True))
    b = _canon(extract(docs, arrow=False))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
