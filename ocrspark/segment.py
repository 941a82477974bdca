"""Stage 2: rule-based task segmentation (pure window/aggregate catalyst).

Re-expresses the reference's marker->range->assignment flow
(/root/reference/scripts/task_boundaries.py:215-291, LLM-driven) as
deterministic sessionization (SURVEY.md G1-G4, W2-W3):

  candidate  = leading rising-number regex             (G2)
  accepted   = candidate == running-max(prior)+1       (W3 rising check)
  task_seq   = running count of accepted markers       (G3 sessionization)
  solution   = per-task cumulative flag -> drop        (G8)
  head/tail  = stripped-length admin window            (F6/F7 replacement)
  renumber   = position in surviving task array        (task_boundaries.py:324-326)
  F4         = raw length < 50 -> drop, keep gaps      (task_boundaries.py:418-423)

Physical shape (asserted in tests/test_plan.py): ONE data-sized exchange —
hash(doc_id) for the sessionization window.  Both follow-up aggregations
(groupBy(doc_id, task_seq), then groupBy(doc_id)) are satisfied by
hash(doc_id) partitioning, so no further exchange, no join, and the input is
scanned exactly once.  Doc-level decisions (admin window, renumbering, F4,
subject/version) happen as array expressions on the one-row-per-doc
aggregate — the Spark translation of the reference's whole-document
list-walk, without leaving the JVM.

Memory bound: one doc's spans as one array row (the reference holds the same
whole-document state in Python lists); Arrow never sees these arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import config as C
from . import rules


def sessionize(flat: DataFrame) -> DataFrame:
    """flat spans -> + (is_marker, task_seq, in_solution)."""
    w_doc = Window.partitionBy("doc_id").orderBy("offset")
    w_task = Window.partitionBy("doc_id", "task_seq").orderBy("offset")
    cand = rules.marker_candidate_number(F.col("kind"), F.col("text"))
    df = flat.withColumn("cand_n", cand)
    run_max_prior = F.coalesce(
        F.max("cand_n").over(w_doc.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    df = df.withColumn(
        "is_marker",
        F.col("cand_n").isNotNull() & (F.col("cand_n") == run_max_prior + 1),
    )
    df = df.withColumn(
        "task_seq",
        F.sum(F.col("is_marker").cast("int")).over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sol = rules.is_solution_start(F.col("kind"), F.col("text"))
    df = df.withColumn(
        "in_solution",
        F.max(sol.cast("int"))
        .over(w_task.rowsBetween(Window.unboundedPreceding, 0))
        == 1,
    )
    return df.drop("cand_n")


def aggregate_tasks(sessionized: DataFrame) -> DataFrame:
    """Solution-drop + per-(doc, task) array aggregation and task census.

    groupBy(doc_id, task_seq) is satisfied by the window's hash(doc_id)
    partitioning: complete groups form map-side, no exchange.
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
    return tasks.withColumn("points", rules.extract_points(F.col("task_text")))


def nest_per_doc(tasks: DataFrame) -> DataFrame:
    """One row per doc: sorted task array + doc-level fields.

    groupBy(doc_id): again satisfied by hash(doc_id), no exchange.  The doc
    text for subject/version (P4/P5) is the ordered concat of the per-task
    texts — identical to the global span-text concat since both skip empties
    and join on single spaces.
    """
    nested = tasks.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("task_seq", "sp", "raw_len", "task_text",
                         "stripped_len", "points")
            )
        ).alias("tarr")
    )
    doc_text = F.array_join(
        F.transform(
            F.filter(F.col("tarr"), lambda x: x["task_text"] != ""),
            lambda x: x["task_text"],
        ),
        " ",
    )
    return nested.withColumn("subject", rules.extract_subject(doc_text)).withColumn(
        "exam_version", rules.extract_version(doc_text)
    )


def select_tasks(nested: DataFrame) -> DataFrame:
    """F6/F7 admin window + renumbering + F4, as array expressions."""
    def _seq_of(valid: Column) -> Column:
        return F.transform(valid, lambda x: x["task_seq"])

    valid = F.filter(
        F.col("tarr"),
        lambda x: (x["task_seq"] >= 1)
        & (x["stripped_len"] >= C.MIN_STRIPPED_TASK_CHARS),
    )
    df = nested.withColumn("first_valid", F.array_min(_seq_of(valid))).withColumn(
        "last_valid", F.array_max(_seq_of(valid))
    )
    windowed = F.filter(
        F.col("tarr"),
        lambda x: (x["task_seq"] >= F.col("first_valid"))
        & (x["task_seq"] <= F.col("last_valid")),
    )
    numbered = F.transform(
        windowed,
        lambda x, i: F.struct(
            (i + 1).cast("string").alias("task_number"),
            x["points"].alias("points"),
            x["raw_len"].alias("raw_len"),
            x["sp"].alias("sp"),
        ),
    )
    surviving = F.filter(numbered, lambda x: x["raw_len"] >= C.MIN_TASK_TEXT_CHARS)
    return df.withColumn("tasks", surviving).select(
        "doc_id", "subject", "exam_version", "tasks"
    )


def segment(flat: DataFrame) -> DataFrame:
    """flat spans -> one row per doc with surviving numbered task array."""
    return select_tasks(nest_per_doc(aggregate_tasks(sessionize(flat))))
