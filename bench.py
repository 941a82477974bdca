#!/usr/bin/env python
"""Headline benchmark: prints ONE JSON line.

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32; master = local[N]).

Headline = the extraction pipeline (the BASELINE.json docs/sec metric) on a
deterministic skew-tailed span corpus sized to the sf, plus the training-data
operator suite on the sf tables.  Corpus generation is cached outside the
timed region.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ocrspark.corpus import generate_docs  # noqa: E402
from ocrspark.ops import dedup, similarity, textstats  # noqa: E402
from ocrspark.pipeline import extract  # noqa: E402
from ocrspark.session import get_spark  # noqa: E402

DOCS_PER_SF = 600_000  # sf0.1 -> 60k docs (~5M spans), sf0.01 -> 6k


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _bench_docs(spark, sf: float):
    n = max(2000, int(DOCS_PER_SF * sf))
    # v2: corpus grammar gained G7 glued-boundary and duplicate-figure cases
    cache = REPO / ".bench_cache" / f"docs_n{n}_s42_v2"
    if not (cache / "_SUCCESS").exists():
        generate_docs(
            spark, n, seed=42, fat_doc_rate=0.001,
            partitions=max(64, (os.cpu_count() or 8) * 4),
        ).write.mode("overwrite").parquet(str(cache))
    return spark.read.parquet(str(cache)), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    os.environ.setdefault("OCRSPARK_DRIVER_MEM", "48g")
    spark = get_spark(app="ocrspark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    docs, n_docs = _bench_docs(spark, sf)
    docs.count()  # warm scan outside timed region

    def tbl(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    # the agg must touch every output column family, or Catalyst prunes the
    # topic/html/G7 work out of the timed plan (their cost must be visible)
    def sink():
        return [
            F.sum(F.size("spans")).alias("n_spans"),
            F.sum(F.length("task_text_html")).alias("html_chars"),
            F.sum(F.length("task_text")).alias("text_chars"),
            F.max("topic").alias("a_topic"),
            F.sum(F.col("was_merged").cast("int")).alias("n_merged"),
        ]

    out_dir = str(REPO / ".bench_cache" / "out")

    # untimed JIT warmup on a 20% hash slice, same plans as the timed
    # queries (a long-lived cluster job amortizes JIT to zero; round-1's
    # "extract" number carried ~60 s of one-time JIT at sf0.1)
    warm = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0)
    extract(warm).agg(*sink()).collect()
    extract(warm, arrow=True).agg(*sink()).collect()

    # the default (round-comparable) suite; opt-in suites append below and
    # are excluded from the untimed warmup (their multi-minute ops carry a
    # negligible JIT share — warming them would just inflate wall time)
    queries = {
        "extract": lambda: extract(docs).agg(*sink()).collect(),
        "extract_sink_parquet": lambda: extract(docs)
        .write.mode("overwrite").parquet(out_dir),
        "extract_arrow_stage1": lambda: extract(docs, arrow=True).agg(*sink()).collect(),
        "dedup_minhash": lambda: dedup.minhash_dedup(tbl("documents"), threshold=0.2)
        .count(),
        "dedup_simhash": lambda: dedup.simhash(tbl("documents")).count(),
        "ann_cosine_topk": lambda: similarity.cosine_topk(tbl("embeddings")).count(),
        "text_stats": lambda: textstats.quality_score(tbl("documents"))
        .join(textstats.token_stats(tbl("documents")), "doc_id").count(),
    }
    core_names = set(queries)
    if os.environ.get("SPARK_GRAFT_CURATION"):
        # opt-in second suite (default suite stays round-comparable): the
        # curation-path ops added in round 3
        from ocrspark.ops import sampling

        queries["dedup_ngram_jaccard"] = lambda: dedup.ngram_jaccard_dedup(
            tbl("documents"), threshold=0.2).count()
        queries["dedup_components"] = lambda: dedup.components(
            dedup.ngram_jaccard_dedup(tbl("documents"), threshold=0.2)
            .select("doc1", "doc2")).count()
        queries["ann_ivf_topk"] = lambda: similarity.ivf_topk(
            tbl("embeddings")).count()
        queries["text_tfidf"] = lambda: textstats.tfidf_topterms(
            tbl("documents")).count()
        queries["curate_decontaminate"] = lambda: sampling.decontaminate(
            tbl("documents")).count()
        queries["curate_pack_shards"] = lambda: sampling.pack_shards(
            tbl("documents").withColumn(
                "n_tokens", F.regexp_count(F.col("text"), F.lit(r"\S+")))
        ).count()
        # round-4 additions
        queries["dedup_substring"] = lambda: dedup.substring_dup_spans(
            tbl("documents")).count()
        # round-5 additions
        queries["dedup_substring_keep"] = lambda: dedup.substring_dedup_keep(
            tbl("documents")).agg(F.sum("n_tokens_dropped")).collect()
        queries["text_strip_boilerplate"] = lambda: (
            textstats.strip_boilerplate_lines(tbl("documents"))
            .agg(F.sum("n_lines_kept")).collect())
        queries["dedup_substring_self"] = lambda: dedup.substring_self_spans(
            tbl("documents"), n=3, min_run_tokens=3).count()
        queries["dedup_substring_keep_self"] = lambda: (
            dedup.substring_dedup_keep(tbl("documents"), n=3,
                                       min_run_tokens=3, include_self=True)
            .agg(F.sum("n_tokens_dropped")).collect())
        queries["ann_pq_topk"] = lambda: similarity.pq_topk(
            tbl("embeddings")).count()
        queries["ann_ivfpq_topk"] = lambda: similarity.ivfpq_topk(
            tbl("embeddings")).count()
        queries["dedup_semantic"] = lambda: similarity.semantic_dedup(
            tbl("embeddings"), threshold=0.4).count()
        queries["text_gopher"] = lambda: textstats.gopher_quality(
            tbl("documents")).count()
        queries["text_top_ngrams"] = lambda: textstats.top_ngrams(
            tbl("documents")).count()
        queries["curate_source_rollup"] = lambda: sampling.source_rollup(
            tbl("documents")).count()
        # round-6 additions
        queries["dedup_substring_keep_text"] = lambda: (
            dedup.substring_dedup_keep(tbl("documents"), n=3,
                                       min_run_tokens=3, include_self=True,
                                       original_text=True)
            .agg(F.sum(F.length("kept_text"))).collect())
        queries["text_repetition_ngrams"] = lambda: (
            textstats.repetition_ngram_stats(tbl("documents"))
            .agg(F.sum("rep_ngram_pass")).collect())
        queries["curate_dsir"] = lambda: (
            sampling.dsir_importance(
                tbl("documents"),
                tbl("documents").filter(F.col("lang") == "en"))
            .agg(F.sum("dsir_score_e9")).collect())
        # mid-round-6 additions
        queries["dedup_lines_global"] = lambda: (
            dedup.line_dedup_keep_first(tbl("documents"))
            .agg(F.sum("n_lines_kept")).collect())
        queries["curate_mixture_weights"] = lambda: (
            sampling.mixture_weights(tbl("documents"))
            .agg(F.sum("temp_share_e9")).collect())
        queries["text_redact_pii"] = lambda: (
            textstats.redact_pii(tbl("documents"))
            .agg(F.sum(F.length("redacted_text"))).collect())
        queries["text_c4_line_filter"] = lambda: (
            textstats.c4_line_filters(tbl("documents"))
            .agg(F.sum("n_lines_kept")).collect())
    if os.environ.get("SPARK_GRAFT_DISAGG"):
        # r1-equivalent plan: sink only the round-1 output column families so
        # Catalyst prunes the round-2 work (topic/html/G7) — isolates "new
        # work per doc" from host noise in one warm session
        queries["extract_r1_columns"] = lambda: extract(docs).agg(
            F.sum(F.size("spans")).alias("n_spans"),
            F.sum("points").alias("points_total"),
        ).collect()

    # ROUNDS interleaved passes; per-query median + spread.  Each lambda
    # rebuilds its DataFrame (a re-collected identical plan can serve cached
    # results on Spark 4.1); single runs on this shared VM swing +/-40%, so
    # one-run-per-query ordering artifacts (round-2's extract-vs-arrow
    # inversion) are medianed away instead of explained away.
    ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))
    # untimed warmup for the DEFAULT operator-suite queries (the extract
    # family warms above on the 20% slice; opt-in suites are excluded —
    # see core_names): their first run otherwise carries plan
    # construction + codegen JIT, which is most of the 50-73% round-4
    # spreads on sub-5s rows and is zero on a long-lived cluster
    for name, fn in queries.items():
        if name in core_names and not name.startswith("extract"):
            fn()
    runs: dict[str, list[float]] = {name: [] for name in queries}
    for _ in range(ROUNDS):
        for name, fn in queries.items():
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))

    def median(xs):
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    # sub-FAST_SEC queries get extra interleaved passes and TRIMMED stats
    # (drop the single max and min of the 5 runs): host-noise swings of
    # 50-73% on sub-second queries carry no round-over-round signal and
    # previously made their deltas unreadable.  Raw runs stay in
    # queries_runs — nothing is hidden, the headline row is just robust.
    FAST_SEC = 5.0
    EXTRA_FAST = int(os.environ.get("SPARK_GRAFT_FAST_ROUNDS", "2"))
    fast = sorted(n for n, xs in runs.items() if median(xs) < FAST_SEC)
    for _ in range(EXTRA_FAST):
        for name in fast:
            t0 = time.time()
            queries[name]()
            runs[name].append(round(time.time() - t0, 3))

    def trimmed(xs):
        return sorted(xs)[1:-1] if len(xs) >= 5 else xs

    timings = {name: round(median(trimmed(xs)), 3) for name, xs in runs.items()}
    spread = {
        name: round(100.0 * (max(trimmed(xs)) - min(trimmed(xs)))
                    / max(median(trimmed(xs)), 1e-9), 1)
        for name, xs in runs.items()
    }

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "ocrspark_headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_runs": runs,
        "queries_spread_pct": spread,
        "fast_queries_trimmed": [n for n in fast if len(runs[n]) >= 5],
        "trim_policy": f"queries with median<{FAST_SEC:g}s run "
                       f"{ROUNDS + EXTRA_FAST} interleaved passes; stats "
                       "drop the single max+min run when >=5 runs exist",
        "rounds": ROUNDS,
        "sf": sf,
        "n_docs": n_docs,
        "parallelism": cpus,
        "docs_per_sec_extract": round(n_docs / timings["extract"], 1),
        "docs_per_sec_with_sink": round(n_docs / timings["extract_sink_parquet"], 1),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
