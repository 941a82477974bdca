"""Physical-plan assertions: the scale claims, checked mechanically.

The pipeline's design contract (segment.py docstring): ONE data-sized
exchange — hash(doc_id) — for the whole extraction; every later window /
groupBy / join reuses that partitioning.  And the native path must contain
no Python workers (BatchEvalPython / ArrowEvalPython), i.e. no per-row or
per-batch Python in the hot path.
"""

import re

from pyspark.sql import functions as F

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


def test_scaled_similarity_paths_are_equi_joins(spark):
    """The dedup/ANN scale paths must never plan a cartesian/nested-loop
    join: banded-LSH near-dups, bucketed ANN search, and the capped MinHash
    candidate join are all equi-joins.  (cosine_topk and the exact=True
    recall baseline are the documented broadcast exceptions.)"""
    from ocrspark.ops import dedup, similarity

    emb = spark.range(64).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(similarity.DIM)),
            lambda i: F.sin(i * (F.col("id") + 1)).cast("float"),
        ).alias("embedding"),
    )
    docs = spark.range(40).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("some words here number "), F.col("id"),
                 F.lit(" more filler words to shingle")).alias("text"),
    )
    for df in [
        similarity.embedding_near_dups(emb, threshold=0.4),
        similarity.lsh_search(emb),
        dedup.minhash_dedup(docs, threshold=0.2),
        dedup.simhash_near_dups(docs),
    ]:
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cosine_topk_query_side_is_bounded(spark):
    """Contract: cosine_topk's broadcast side is runtime-capped in-plan —
    a corpus-sized query set raises instead of OOMing the broadcast — and
    an explicit bounded `queries` DataFrame is the shipped API."""
    import pytest

    from ocrspark.ops import similarity

    emb = spark.range(120).select(
        F.col("id").cast("int").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(similarity.DIM)),
            lambda i: F.sin(i * (F.col("id") + 1)).cast("float"),
        ).alias("embedding"),
    )
    # explicit query DataFrame: results cover exactly those query ids
    q = emb.filter(F.col("vec_id").isin(3, 7))
    rows = similarity.cosine_topk(emb, k=2, queries=q).collect()
    assert {r.query_id for r in rows} == {3, 7}
    assert len(rows) == 4
    # over-cap query set fails loudly at runtime (the guard survives
    # Catalyst optimization — it must not be folded away)
    with pytest.raises(Exception, match="max_queries"):
        similarity.cosine_topk(emb, k=2, query_mod=1, max_queries=16).collect()


def test_embedding_near_dups_recall(spark):
    """Bucketed pairs are a subset of exact pairs, with usable recall at the
    dedup-relevant threshold."""
    from ocrspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r.id1, r.id2) for r in
             similarity.embedding_near_dups(emb, 0.4, exact=True).collect()}
    banded = {(r.id1, r.id2) for r in
              similarity.embedding_near_dups(emb, 0.4).collect()}
    assert banded <= exact
    assert len(exact) > 0
    assert len(banded) / len(exact) >= 0.5  # OR-of-ANDs recall at cos>=0.4


def test_simhash_blocks_exact_for_low_hamming(spark):
    """The byte-block candidate join is EXACT (not approximate) for
    hamming <= SIMHASH_BLOCKS - 1: compare against brute-force pairs."""
    from itertools import combinations

    from ocrspark.ops import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    brute = {
        (min(a, b), max(a, b), bin(sh[a] ^ sh[b]).count("1"))
        for a, b in combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= dedup.SIMHASH_MAX_HAMMING
    }
    got = {(r.doc1, r.doc2, r.hamming)
           for r in dedup.simhash_near_dups(docs).collect()}
    assert got == brute and len(brute) > 0


def test_whole_stage_codegen_present(spark):
    docs = generate_docs(spark, 10, seed=1)
    df = extract(docs, arrow=False)
    df.collect()  # finalize AQE so codegen ids ("*(n)") appear
    plan = _plan(df)
    assert plan.count("*(") > 0


def test_media_decode_arrow_batch_cap(spark):
    """The payload decode must be batch-shape independent: driving 3000
    payload rows through mapInPandas with a tiny Arrow batch cap (forcing
    many batches) yields byte-identical features to the direct pandas call."""
    import pandas as pd

    from ocrspark.ops import media

    refs = spark.range(3000).select(
        F.concat(F.lit("media/img_"), F.col("id")).alias("media_ref"),
        F.expr("unhex(repeat(md5(concat('media/img_', id)), "
               "cast(id % 5 + 1 as int)))").alias("payload"),
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        got = {
            r.media_ref: (r.width, r.height, r.n_bytes, tuple(r.feature))
            for r in media.extract_media_features(refs).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pdf = refs.toPandas()
    exp_df = media.fake_decode(pdf["media_ref"], pdf["payload"])
    exp = {
        r.media_ref: (r.width, r.height, r.n_bytes, tuple(r.feature))
        for r in exp_df.itertuples()
    }
    assert len(got) == 3000
    assert got == exp
    # n_bytes really measured the payload that crossed the Arrow boundary
    assert {v[2] for v in got.values()} == {16 * k for k in range(1, 6)}
