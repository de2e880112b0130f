"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Headline set = the KG-construction pipeline (the engine's flagship job,
timed end-to-end as kg_build) + representative operators from each family
(scan+agg, star join, window dedup, text analysis, near-dup, similarity).

SESSION ISOLATION (round 4): round 3 recorded word_cooccurrence at
12.06 s min-of-3 inside the bench session vs 0.81 s standalone on the
same box/code — the full-size kg_build warmup + 3 kg_build repeats
that preceded the SQL set contaminated the long-lived session (GC
pressure / codegen cache / python-worker fleet state). The SQL set now
runs FIRST in its own fresh SparkSession, which is stopped before a
second session runs kg_build — each family is measured in the session
state it would really run in. A drift guard re-times the first SQL
query at the end of the SQL session and flags (sql_drift_check in the
JSON) if the session has slowed >3x, so a recurrence is visible in the
recorded artifact instead of silently inflating per-query numbers.

Cross-round accounting: round 2 added legal_citations +
doc_classification to the round-1 set; round 3 added doc_filter_funnel,
bpe_merges, lang_distinct_hll, and doc_bm25_topk (~3-6s combined);
round 4 added doc_dup_span_removal (~2.4s) and doc_backoff_lm
(~3.6s); round 5 added doc_backoff_lm_broadcast — compare totals across
rounds net of the additions, and per-query mins (not totals) for
drift. Numbers are min-of-N in-process repeats; the
host itself drifts 25-40%.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BENCH_SQL = [
    "pricing_summary", "region_revenue", "top_customers",
    "events_latest_per_user", "word_cooccurrence", "doc_token_stats",
    "ngram_jaccard_pairs", "cosine_topk", "knn_join",
    # round-2 operator families: regex NER + keyword classification
    "legal_citations", "doc_classification",
    # round-3 families: composed filter funnel + iterative BPE train
    "doc_filter_funnel", "bpe_merges",
    # round-3 additions: sketches (HLL) + lexical retrieval (BM25)
    "lang_distinct_hll", "doc_bm25_topk",
    # round-4 additions: ExactSubstr-style corpus rewrite + bigram
    # Stupid Backoff LM scoring
    "doc_dup_span_removal", "doc_backoff_lm",
    # round-5 addition: Zipf-head-broadcast backoff twin (same answer,
    # broadcast-hit execution — its delta vs doc_backoff_lm is the
    # measured cost/benefit of the head/tail split at this scale)
    "doc_backoff_lm_broadcast",
]


def _timed(spark, name, fn, timings, samples, n_repeats):
    """min-of-N in-process repeats (round 3): the host drifts 25-40%
    minute-to-minute and the first measurement carries JIT/page-cache
    warmup — the per-query MIN is the stable cross-round signal.
    clearCache between repeats matters for kg_build specifically:
    build_kg persists its extraction output and Spark's CacheManager
    matches identical logical plans ACROSS build_kg calls, so without
    it repeats 2..N of kg_build would reuse repeat 1's cached extract
    and time only the post-extract tail. For the uncached SQL queries
    it is a harmless no-op (they re-execute fully regardless)."""
    from llm_knowledge_graph_spark.plans import driver_queries as DQ
    ts = []
    for _ in range(n_repeats):
        spark.catalog.clearCache()
        # the BPE merge table memoizes per (sf_dir, n) — a real engine
        # behavior (one training pass per session), but the bench metric
        # is the UNCACHED per-query cost, so repeats must retrain
        DQ._BPE_MERGES_CACHE.clear()
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    samples[name] = ts
    timings[name] = min(ts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    n_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    from llm_knowledge_graph_spark.plans import driver_queries as DQ
    from llm_knowledge_graph_spark.session import get_spark

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    # ---- session 1: the SQL/operator headline set (fresh session) ----
    spark = get_spark(app_name="kgspark-bench-sql",
                      master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for name in BENCH_SQL:
        fn = DQ.SQL_QUERIES[name]
        _timed(spark, name, lambda fn=fn: fn(spark, sf_dir).collect(),
               timings, samples, n_repeats)

    from llm_knowledge_graph_spark.operators.dedup import \
        minhash_lsh_near_dups
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _timed(spark, "minhash_near_dup",
           lambda: minhash_lsh_near_dups(docs, "doc_id", "text").count(),
           timings, samples, n_repeats)

    # drift guard (widened round 5 — VERDICT r4 item 4): re-time the
    # first SQL query PLUS the heaviest queries at session end, so a
    # recorded-min wobble on any of them (the r4 minhash 2.97->4.12 s
    # case) is adjudicated by the artifact itself: if end-of-session
    # fresh times sit within 1.5x of the recorded mins, the recorded
    # numbers are session-clean; >3x flags contamination.
    def _probe(name, fn):
        spark.catalog.clearCache()
        DQ._BPE_MERGES_CACHE.clear()
        t0 = time.perf_counter()
        fn()
        t = round(time.perf_counter() - t0, 3)
        rec = timings[name]
        return {"query": name, "end_of_session_sec": t,
                "recorded_min_sec": rec,
                "recorded_within_1_5x_fresh": bool(rec <= 1.5 * t + 0.05),
                "drifted_3x": bool(t > 3 * max(rec, 0.05))}

    probes = [BENCH_SQL[0], "doc_backoff_lm", "bpe_merges"]
    sql_drift_check = [
        _probe(name,
               lambda name=name: DQ.SQL_QUERIES[name](spark,
                                                      sf_dir).collect())
        for name in probes]
    sql_drift_check.append(_probe(
        "minhash_near_dup",
        lambda: minhash_lsh_near_dups(docs, "doc_id", "text").count()))
    spark.stop()

    # ---- session 2: the flagship KG construction job ----
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    from llm_knowledge_graph_spark.sources.pages import synthesize_pages

    spark = get_spark(app_name="kgspark-bench-kg",
                      master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # flagship: full KG construction over a corpus scaled with sf
    n_pages = max(400, int(20000 * sf))

    # warm the python-worker fleet + JIT + plan caches (untimed), same
    # protocol as tools/scaling_bench.py — the timed number measures the
    # job, not session cold-start. The warmup is FULL-SIZE: a 64-page
    # warmup left the timed repeats still descending (22 -> 13 -> 9s;
    # JIT tiering + worker fleet only warm at the real batch shape),
    # which put host-start noise, not the job, in the recorded min.
    warm = build_kg(spark, synthesize_pages(spark, n_pages, seed=1,
                                            parallelism=cpus),
                    PipelineConfig())
    warm.canonical_edges.count()
    spark.catalog.clearCache()

    def kg_build():
        # parallelism = cpus: ONE task wave through the fused extractor.
        # 2x cpus measured 2-8s slower at this size (two waves, double
        # the per-task Arrow/python-worker setup) with no skew to smooth
        # — the extractor's work is uniform per page. At real scale the
        # input is a parquet scan and maxPartitionBytes sizes the waves.
        pages = synthesize_pages(spark, n_pages, seed=42,
                                 parallelism=cpus)
        res = build_kg(spark, pages, PipelineConfig())
        # force the full DAG: canonical graph + counts
        res.canonical_edges.count()
        res.canonical_nodes.count()

    _timed(spark, "kg_build", kg_build, timings, samples, n_repeats)
    spark.stop()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,          # per-query MIN of n_repeats
        "n_repeats": n_repeats,
        "samples": samples,          # every repeat, for drift inspection
        "session_isolation": "sql set in fresh session, kg_build in its "
                             "own second session (round-4 fix)",
        "sql_drift_check": sql_drift_check,
        "sf": sf,
        "cpus": cpus,
        "kg_pages": n_pages,
    }))


if __name__ == "__main__":
    main()
