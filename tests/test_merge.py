"""G7 short-task forward-merge (old/taskseparation.py:29-66 semantics)."""

from ocrspark.merge import merge_short_tasks


def test_merge_short_tasks(spark):
    long_a = "x" * 30 + " se oppgave 7 for detaljer " + "y" * 60
    rows = [
        # doc1: task 2 invalid (<100 chars), task 1 has a late heading match
        ("d1", "1", long_a),
        ("d1", "2", "kort tekst"),
        ("d1", "3", "z" * 120),
        # doc2: nothing to merge
        ("d2", "1", "a" * 150),
        ("d2", "2", "b" * 150),
    ]
    df = spark.createDataFrame(rows, "doc_id string, task_number string, task_text string")
    out = {(r.doc_id, r.task_number): r for r in merge_short_tasks(df).collect()}

    split = long_a.lower().index("oppgave 7", 25)
    # reference swap: head + invalid-task text stays at j-1; tail moves to j
    assert out[("d1", "1")].task_text == long_a[:split] + "kort tekst"
    assert out[("d1", "2")].task_text == long_a[split:]
    assert out[("d1", "1")].was_merged and out[("d1", "2")].was_merged
    assert out[("d1", "3")].task_text == "z" * 120
    assert not out[("d1", "3")].was_merged
    assert out[("d2", "1")].task_text == "a" * 150
    assert not out[("d2", "1")].was_merged


def test_merge_order_is_numeric(spark):
    # task 10 must sort after 9 (numeric, not lexicographic)
    rows = [("d", str(i), f"task {i} " + "x" * 120) for i in [9, 10, 11, 1]]
    df = spark.createDataFrame(rows, "doc_id string, task_number string, task_text string")
    out = merge_short_tasks(df)
    assert {r.task_number for r in out.collect()} == {"1", "9", "10", "11"}
