"""Physical-plan assertions: the scale claims, checked mechanically.

The pipeline's design contract (segment.py docstring): ONE data-sized
exchange — hash(doc_id) — for the whole extraction; every later window /
groupBy / join reuses that partitioning.  And the native path must contain
no Python workers (BatchEvalPython / ArrowEvalPython), i.e. no per-row or
per-batch Python in the hot path.
"""

import re

from ocrspark.corpus import generate_docs
from ocrspark.pipeline import extract


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_exchange_native(spark):
    docs = generate_docs(spark, 10, seed=1)
    plan = _plan(extract(docs, arrow=False))
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # one data exchange on doc_id; AQE may add nothing else
    assert len(exchanges) == 1, f"expected 1 exchange, got {exchanges}\n{plan}"
    assert "doc_id" in exchanges[0]


def test_no_python_in_native_plan(spark):
    docs = generate_docs(spark, 10, seed=1)
    # generator itself is ArrowEval (test data); strip its scan side by
    # checking only operators above the first project of the pipeline.
    plan = _plan(extract(docs, arrow=False))
    # the only Python stage allowed is the corpus generator's mapInPandas
    assert plan.count("MapInPandas") <= 1
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_no_cartesian_or_nested_loop(spark):
    docs = generate_docs(spark, 10, seed=1)
    plan = _plan(extract(docs, arrow=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_present(spark):
    docs = generate_docs(spark, 10, seed=1)
    df = extract(docs, arrow=False)
    df.collect()  # finalize AQE so codegen ids ("*(n)") appear
    plan = _plan(df)
    assert plan.count("*(") > 0
