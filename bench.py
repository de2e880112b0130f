"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Headline set = the KG-construction pipeline (the engine's flagship job,
timed end-to-end as kg_build) + representative operators from each family
(scan+agg, star join, window dedup, text analysis, near-dup, similarity).

Cross-round accounting: round 2 added legal_citations +
doc_classification to the round-1 set; round 3 added doc_filter_funnel,
bpe_merges, lang_distinct_hll, and doc_bm25_topk (~3-6s combined) —
compare totals across rounds net of the additions, and per-query mins
(not totals) for drift. Numbers are min-of-N in-process repeats; the
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans import driver_queries as DQ
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    from llm_knowledge_graph_spark.session import get_spark
    from llm_knowledge_graph_spark.sources.pages import synthesize_pages

    spark = get_spark(app_name="kgspark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    n_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def timed(name, fn):
        """min-of-N in-process repeats (round 3): the host drifts 25-40%
        minute-to-minute and the first measurement carries JIT/page-cache
        warmup — the per-query MIN is the stable cross-round signal.
        clearCache between repeats matters for kg_build specifically:
        build_kg persists its extraction output and Spark's CacheManager
        matches identical logical plans ACROSS build_kg calls, so without
        it repeats 2..N of kg_build would reuse repeat 1's cached extract
        and time only the post-extract tail. For the uncached SQL queries
        it is a harmless no-op (they re-execute fully regardless)."""
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

    timed("kg_build", kg_build)

    bench_sql = [
        "pricing_summary", "region_revenue", "top_customers",
        "events_latest_per_user", "word_cooccurrence", "doc_token_stats",
        "ngram_jaccard_pairs", "cosine_topk", "knn_join",
        # round-2 operator families: regex NER + keyword classification
        "legal_citations", "doc_classification",
        # round-3 families: composed filter funnel + iterative BPE train
        "doc_filter_funnel", "bpe_merges",
        # round-3 additions: sketches (HLL) + lexical retrieval (BM25)
        "lang_distinct_hll", "doc_bm25_topk",
    ]
    for name in bench_sql:
        fn = DQ.SQL_QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).collect())

    from llm_knowledge_graph_spark.operators.dedup import minhash_lsh_near_dups
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("minhash_near_dup",
          lambda: minhash_lsh_near_dups(docs, "doc_id", "text").count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,          # per-query MIN of n_repeats
        "n_repeats": n_repeats,
        "samples": samples,          # every repeat, for drift inspection
        "sf": sf,
        "cpus": cpus,
        "kg_pages": n_pages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
