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
# P11 keyword-lexicon topics.  9/15 agree with the reference catalog's
# LLM labels (exams.json tasks); the 6 disagreements are each defensible or
# outright corrections of LLM noise — e.g. the catalog labels task 1 (unit
# conversion of acceleration) "Fluidmekanikk" and task 11 (buoyancy of a
# floating cube) "Dynamikk"; tasks 8/10 (moment of inertia, rolling cylinder)
# are the more specific "Rotasjonsdynamikk" here.
GOLDEN_TOPICS = [
    "Kinematikk", "Kinematikk", "Kinematikk", "Dynamikk", "Kinematikk",
    "Dynamikk", "Kinematikk", "Rotasjonsdynamikk", "Programmering",
    "Rotasjonsdynamikk", "Fluidmekanikk", "Fluidmekanikk", "Svingninger",
    "Svingninger", "Bølgefysikk", "Bølgefysikk",
]
# tasks where the reference's own LLM label matches the lexicon topic
GOLDEN_REF_AGREEMENT = 9
# per-task disagreement census vs exams.json (task_number -> (lexicon, ref));
# task 16 has no catalog row at all (the reference's V24 entry stops at 15).
GOLDEN_REF_DISAGREE = {
    "1": ("Kinematikk", "Fluidmekanikk"),     # unit conversion of accel.
    "5": ("Kinematikk", "Dynamikk"),
    "8": ("Rotasjonsdynamikk", "Dynamikk"),   # moment of inertia
    "10": ("Rotasjonsdynamikk", "Dynamikk"),  # rolling cylinder
    "11": ("Fluidmekanikk", "Dynamikk"),      # buoyancy of a floating cube
    "15": ("Bølgefysikk", "Svingninger"),
    "16": ("Bølgefysikk", None),              # absent from the catalog
}


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


def test_pyref_golden_topics_html_merge(golden, golden_spans):
    """P11 topics pinned; P13 HTML shape; G7 no-op on the real document."""
    import json
    from pathlib import Path

    out = pyref.extract_doc(golden["doc_id"], golden_spans)
    assert [t.topic for t in out.tasks] == GOLDEN_TOPICS
    # cross-check agreement with the reference's published catalog labels
    ref = json.loads(
        Path("/root/reference/exams.json").read_text(encoding="utf-8")
    )["IFYX1000"]["exams"]["V24"]["tasks"]
    ref_topics = {t["task_number"]: t["topic"] for t in ref}
    agree = sum(
        1 for t in out.tasks if ref_topics.get(t.task_number) == t.topic
    )
    assert agree >= GOLDEN_REF_AGREEMENT
    # the disagreement set is pinned per task, not just counted
    disagree = {
        t.task_number: (t.topic, ref_topics.get(t.task_number))
        for t in out.tasks if ref_topics.get(t.task_number) != t.topic
    }
    assert disagree == GOLDEN_REF_DISAGREE
    # P13 html: <p>-paragraph body + exact points trailer, inline points gone
    for t in out.tasks:
        assert t.task_text_html.endswith(f"<p>Maks poeng: {t.points}</p>")
        body = t.task_text_html.rsplit("\n\n", 1)[0]
        assert body.startswith("<p>") and "Maks poeng" not in body
    # the real document has no short-task glue -> G7 is a no-op
    assert not any(t.was_merged for t in out.tasks)
    assert all(t.task_text for t in out.tasks)


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
