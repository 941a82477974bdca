"""Golden span-sequence-equality test (FIXTURES.md section 3).

Input: the reference's real container dump (temp_output.txt, IFYX1000 V24,
119 containers).  Expectation: the pyref executable spec, pinned here with
structural assertions against the real exam's known shape (16 rising-number
markers; points trailers from the document; image-before-text ordering).
"""

import pytest
from pyspark.sql import functions as F

from ocrspark import pyref
from ocrspark.pipeline import extract

# Boundary containers of the real document (leading rising numbers 1..16).
GOLDEN_MARKERS = [0, 2, 11, 15, 20, 31, 39, 44, 49, 67, 78, 84, 91, 95, 102, 113]
# "Maks poeng: N" trailer values per task, transcribed from the document.
GOLDEN_POINTS = [2, 2, 2, 2, 2, 15, 2, 2, 4, 15, 2, 15, 2, 2, 4, 2]


def test_pyref_golden_shape(golden, golden_spans):
    out = pyref.extract_doc(golden["doc_id"], golden_spans)
    assert len(out.tasks) == 16
    assert [t.task_number for t in out.tasks] == [str(i) for i in range(1, 17)]
    assert [t.points for t in out.tasks] == GOLDEN_POINTS
    # marker spans got their leading number stripped
    t1 = out.tasks[0].spans[0]
    assert t1.text.startswith("Hvor mange")
    # image-before-text ordering inside each task
    for t in out.tasks:
        kinds = [s.kind for s in t.spans]
        assert kinds == sorted(kinds, key=lambda k: 0 if k == "image" else 1)
        assert [s.offset for s in t.spans] == list(range(len(t.spans)))
    # task 2 contains the acceleration-graph image (container 3, OCR "Start")
    assert out.tasks[1].spans[0].kind == "image"
    assert out.tasks[1].spans[0].text == "Start"


def test_pyref_golden_markers(golden_spans):
    run_max, accepted = 0, []
    for kind, text, _, off in golden_spans:
        n = pyref.marker_number(kind, text)
        if n is not None and n == run_max + 1:
            accepted.append(off)
        if n is not None:
            run_max = max(run_max, n)
    assert accepted == GOLDEN_MARKERS


@pytest.mark.parametrize("arrow", [False, True], ids=["native", "arrow"])
def test_spark_golden_equality(spark, golden, golden_spans, golden_docs_df, arrow):
    got = (
        extract(golden_docs_df, arrow=arrow)
        .orderBy(F.col("task_number").cast("int"))
        .collect()
    )
    exp = pyref.extract_doc(golden["doc_id"], golden_spans)
    assert len(got) == len(exp.tasks)
    for r, e in zip(got, exp.tasks):
        assert r.task_number == e.task_number
        assert r.points == e.points
        assert r.subject == exp.subject
        assert r.exam_version == exp.exam_version
        got_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        exp_spans = [(s.kind, s.text, s.media_ref, s.offset) for s in e.spans]
        assert got_spans == exp_spans, f"task {r.task_number}"
