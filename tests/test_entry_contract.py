"""Driver-contract sanity: entry/queries/oracle_sql shape invariants."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.columns == ["doc_id", "subject", "exam_version", "task_number", "points"]
    assert df.count() > 0


def test_queries_oracle_alignment():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    # every query is oracle-backed (the media decode went payload-fed +
    # oracled in round 3; real_decode stays the documented codec seam)
    assert set(q) - set(o) == set()
    assert len(q) >= 20


def test_every_query_runs_small(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF_DIR)
        assert df.limit(1).count() >= 0, name
