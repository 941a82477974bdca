"""Deterministic sampling/packing contracts."""

from pyspark.sql import functions as F

from ocrspark.ops import sampling


def test_split_is_pure_function_of_key(spark):
    docs = spark.range(300).select(F.col("id").cast("int").alias("doc_id"))
    a = {(r.doc_id, r.split)
         for r in sampling.deterministic_split(docs).collect()}
    b = {(r.doc_id, r.split)
         for r in sampling.deterministic_split(docs.repartition(7)).collect()}
    assert a == b
    names = {s for _, s in a}
    assert names <= {"train", "val", "test"}
    assert sum(1 for _, s in a if s == "train") > 250  # ~98%


def test_decontaminate_finds_planted_leak(spark):
    """A verbatim 8-gram planted in one eval-split doc and one train doc
    is reported exactly once; unrelated docs are silent."""
    import hashlib

    def bp(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % 10000

    ev = next(i for i in range(1000) if bp(i) >= 9800)
    tr = next(i for i in range(1000) if bp(i) < 9800)
    other = next(i for i in range(1000) if bp(i) < 9800 and i != tr)
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            (ev, "intro words here " + leak),
            (tr, leak + " trailing content words"),
            (other, "completely different content with no overlap at all"),
        ],
        "doc_id int, text string",
    )
    rows = sampling.decontaminate(docs).collect()
    assert [(r.test_doc, r.train_doc, r.n_shared) for r in rows] == [(ev, tr, 1)]


def test_pack_shards_concat_and_chunk(spark):
    """Offsets/shards must equal laying the per-bucket token stream end to
    end and cutting every `budget` tokens (docs may span boundaries)."""
    docs = spark.range(50).select(
        F.col("id").cast("int").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("int").alias("n_tokens"),
    )
    out = sampling.pack_shards(docs, n_buckets=4, budget=10).collect()
    toks = {r.doc_id: (r.doc_id % 7 + 1) for r in docs.collect()}
    # reconstruct each bucket's stream in the op's deterministic order
    import hashlib

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)

    by_bucket = {}
    for r in out:
        assert r.pack_bucket == h(r.doc_id) % 4
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: (h(r.doc_id), r.doc_id))
        cum = 0
        for r in rows:
            assert r.shard_seq == cum // 10, r
            assert r.offset_tokens == cum % 10, r
            cum += toks[r.doc_id]
