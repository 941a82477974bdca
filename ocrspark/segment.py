"""Stage 2: rule-based task segmentation (pure window/aggregate catalyst).

Re-expresses the reference's marker->range->assignment flow
(/root/reference/scripts/task_boundaries.py:215-291, LLM-driven) as
deterministic sessionization (SURVEY.md G1-G4, W2-W3):

  candidate  = leading rising-number regex             (G2)
  accepted   = candidate == running-max(prior)+1       (W3 rising check)
  task_seq   = running count of accepted markers       (G3 sessionization)
  solution   = per-task cumulative flag -> drop        (G8)
  head/tail  = stripped-length admin window            (F6/F7 replacement)
  renumber   = row_number over surviving tasks         (task_boundaries.py:324-326)
  F4         = raw length < 50 -> drop, keep gaps      (task_boundaries.py:418-423)

Shuffle budget: ONE exchange, hash(doc_id), for the first window.  Every
subsequent window / groupBy keys on (doc_id, ...) supersets, which
hash(doc_id) already satisfies (ClusteredDistribution subset rule), so
Catalyst inserts only local sorts — verified in tests/test_plan.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import config as C
from . import rules

def sessionize(flat: DataFrame) -> DataFrame:
    """flat spans -> + (cand_n, is_marker, task_seq, in_solution)."""
    W_DOC = Window.partitionBy("doc_id").orderBy("offset")
    W_TASK = Window.partitionBy("doc_id", "task_seq").orderBy("offset")
    cand = rules.marker_candidate_number(F.col("kind"), F.col("text"))
    df = flat.withColumn("cand_n", cand)
    run_max_prior = F.coalesce(
        F.max("cand_n").over(W_DOC.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    df = df.withColumn(
        "is_marker",
        F.col("cand_n").isNotNull() & (F.col("cand_n") == run_max_prior + 1),
    )
    df = df.withColumn(
        "task_seq",
        F.sum(F.col("is_marker").cast("int")).over(
            W_DOC.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sol = rules.is_solution_start(F.col("kind"), F.col("text"))
    df = df.withColumn(
        "in_solution",
        F.max(sol.cast("int"))
        .over(W_TASK.rowsBetween(Window.unboundedPreceding, 0))
        == 1,
    )
    return df


def doc_fields(sessionized: DataFrame) -> DataFrame:
    """Doc-level subject/version from the full recovered text (pre-drop).

    groupBy(doc_id) on data already hash(doc_id)-partitioned: no exchange.
    """
    doc_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("text") != "", F.struct("offset", "text"))
                )
            ),
            lambda x: x["text"],
        ),
        " ",
    )
    return sessionized.groupBy("doc_id").agg(
        rules.extract_subject(doc_text).alias("subject"),
        rules.extract_version(doc_text).alias("exam_version"),
    )


def aggregate_tasks(sessionized: DataFrame) -> DataFrame:
    """Solution-drop + per-(doc, task) array aggregation and task census.

    groupBy(doc_id, task_seq) is satisfied by hash(doc_id): no exchange,
    complete groups form map-side.
    """
    kept = sessionized.filter(~F.col("in_solution"))
    tasks = kept.groupBy("doc_id", "task_seq").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref", "is_marker"))
        ).alias("sp"),
        F.sum(F.length("text")).alias("raw_len"),
    )
    task_text = F.array_join(
        F.transform(
            F.filter(F.col("sp"), lambda x: x["text"] != ""), lambda x: x["text"]
        ),
        " ",
    )
    tasks = tasks.withColumn("task_text", task_text)
    tasks = tasks.withColumn(
        "stripped_len",
        F.length(rules.strip_admin(rules.strip_label(F.col("task_text")))),
    )
    tasks = tasks.withColumn("points", rules.extract_points(F.col("task_text")))
    return tasks


def select_tasks(tasks: DataFrame) -> DataFrame:
    """F6/F7 head/tail admin window, renumbering, F4 short-task drop."""
    w_doc = Window.partitionBy("doc_id")
    valid_seq = F.when(
        (F.col("task_seq") >= 1)
        & (F.col("stripped_len") >= C.MIN_STRIPPED_TASK_CHARS),
        F.col("task_seq"),
    )
    tasks = tasks.withColumn("first_valid", F.min(valid_seq).over(w_doc)).withColumn(
        "last_valid", F.max(valid_seq).over(w_doc)
    )
    window_kept = tasks.filter(
        F.col("task_seq").between(F.col("first_valid"), F.col("last_valid"))
    )
    numbered = window_kept.withColumn(
        "task_number",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("task_seq"))
        .cast("string"),
    )
    return numbered.filter(F.col("raw_len") >= C.MIN_TASK_TEXT_CHARS)


def segment(flat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (surviving tasks with span arrays, doc-level fields)."""
    s = sessionize(flat)
    return select_tasks(aggregate_tasks(s)), doc_fields(s)
