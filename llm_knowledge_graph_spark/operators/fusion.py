"""Fact fusion: support scoring + conflict-aware property election.

The reference commits every extracted occurrence straight into Neo4j
(`MERGE ... SET += props`, code/pdf_graphrag.py:272-300) — the graph
keeps only the last writer and no record of HOW MANY independent pages
asserted a triple or whether they disagreed. At web scale that signal is
the difference between a fact and an extraction artifact (the Knowledge
Vault recipe: score each triple by the number and agreement of its
witnesses). This operator runs BESIDE the reference-faithful merge
(operators/merge.py keeps last-writer-wins semantics untouched) and
produces, per canonical edge key:

* ``n_mentions`` — total witnessing occurrences,
* ``n_urls``     — distinct supporting pages (the independence proxy),
* ``properties`` — the ELECTED property map: per key, the modal value
  (most witnesses; ties broken by lexicographically smallest value —
  deterministic and engine-portable, no ingestion-order dependence),
* ``n_conflicts`` — how many property keys had >1 distinct value.

Scale shape: every step is a hash aggregation with map-side partials —
occurrence → (key, k, v) counts → per-(key, k) max_by election →
per-key reassembly. Per-group state is bounded by the number of
distinct (k, v) pairs, never by mention count; a hot triple's millions
of identical mentions collapse per input partition before any shuffle.
``n_urls`` is an exact distinct (one extra shuffle on the same key);
swap in sketches.hll_registers when an estimate suffices.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_KEYS = ["subj", "subj_type", "pred", "obj", "obj_type"]


def fuse_edges(edges_raw: DataFrame,
               keys: List[str] = EDGE_KEYS) -> DataFrame:
    """occurrence-level edges(keys..., properties, url, ...) → one row
    per key with support counts and majority-elected properties."""
    base = edges_raw.select(
        *keys, "url", F.explode_outer("properties").alias("k", "v"))

    # support: mentions = occurrence rows (count the distinct-k explosion
    # back out via a per-occurrence marker-free path: count occurrences
    # on the unexploded frame)
    support = (edges_raw.groupBy(*keys)
               .agg(F.count("*").alias("n_mentions"),
                    F.countDistinct("url").alias("n_urls")))

    # per-(key, property k, value v): witness count, then elect the modal
    # value with (max count, min value) — both aggs map-side combinable
    kv_counts = (base.filter(F.col("k").isNotNull())
                 .groupBy(*keys, "k", "v")
                 .agg(F.count("*").alias("n")))
    # max_by with a struct orders lexicographically: higher n wins; on a
    # tie the SMALLEST v must win, so order by (n, negated-v) — strings
    # can't negate, so invert via a descending-safe trick: max_by on
    # struct(n) alone is ambiguous; instead use min_by(v) over ties after
    # computing the per-(key,k) max n.
    top_n = kv_counts.groupBy(*keys, "k").agg(F.max("n").alias("top"))
    elected = (kv_counts.join(top_n, [*keys, "k"])
               .filter(F.col("n") == F.col("top"))
               .groupBy(*keys, "k")
               .agg(F.min("v").alias("v")))
    n_vals = kv_counts.groupBy(*keys, "k").agg(
        F.countDistinct("v").alias("n_vals"))
    per_key = elected.join(n_vals, [*keys, "k"])

    props = (per_key.groupBy(*keys)
             .agg(F.map_from_entries(
                      F.sort_array(F.collect_list(F.struct("k", "v"))))
                  .alias("properties"),
                  F.sum(F.when(F.col("n_vals") > 1, 1).otherwise(0))
                  .cast("long").alias("n_conflicts")))

    return (support.join(props, keys, "left")
            .withColumn("properties",
                        F.coalesce("properties",
                                   F.map_from_entries(F.array().cast(
                                       "array<struct<k:string,v:string>>"))))
            .withColumn("n_conflicts",
                        F.coalesce("n_conflicts", F.lit(0).cast("long"))))


def fusion_state(edges_raw: DataFrame,
                 keys: List[str] = EDGE_KEYS) -> DataFrame:
    """Mergeable fusion accumulator — the incremental/streaming form of
    :func:`fuse_edges` (same discipline as merge.kv_level1 and the
    sketch register tables): one row per (keys..., url, k, v) carrying
    the witness count ``n``. EVERY occurrence additionally contributes
    one (k=null, v=null) MARKER row, so the exact mention count
    survives folding even when occurrences of the same (key, url) carry
    different property-key sets (deriving mentions from property rows
    alone is lossy in that case). States from disjoint batches/shards
    fold by summing ``n`` on the full grain (:func:`fusion_fold`), and
    :func:`fusion_answer` finishes a state into exactly
    ``fuse_edges``'s output — equality is test-asserted."""
    markers = edges_raw.select(
        *keys, "url",
        F.lit(None).cast("string").alias("k"),
        F.lit(None).cast("string").alias("v"))
    prop_rows = edges_raw.select(
        *keys, "url", F.explode("properties").alias("k", "v"))
    return (markers.unionByName(prop_rows)
            .groupBy(*keys, "url", "k", "v")
            .agg(F.count("*").alias("n")))


def fusion_fold(states: DataFrame,
                keys: List[str] = EDGE_KEYS) -> DataFrame:
    """Fold a union of fusion states into one (exact: counts add)."""
    return states.groupBy(*keys, "url", "k", "v").agg(
        F.sum("n").alias("n"))


def fusion_answer(state: DataFrame,
                  keys: List[str] = EDGE_KEYS) -> DataFrame:
    """Finish a fusion state into fuse_edges' output contract: mention
    count = the null-k marker mass (exact — one marker per occurrence),
    n_urls = distinct urls over the marker rows."""
    markers = state.filter(F.col("k").isNull())
    support = markers.groupBy(*keys).agg(
        F.sum("n").alias("n_mentions"),
        F.countDistinct("url").alias("n_urls"))

    kv_counts = (state.filter(F.col("k").isNotNull())
                 .groupBy(*keys, "k", "v").agg(F.sum("n").alias("n")))
    top_n = kv_counts.groupBy(*keys, "k").agg(F.max("n").alias("top"))
    elected = (kv_counts.join(top_n, [*keys, "k"])
               .filter(F.col("n") == F.col("top"))
               .groupBy(*keys, "k").agg(F.min("v").alias("v")))
    n_vals = kv_counts.groupBy(*keys, "k").agg(
        F.countDistinct("v").alias("n_vals"))
    props = (elected.join(n_vals, [*keys, "k"])
             .groupBy(*keys)
             .agg(F.map_from_entries(
                      F.sort_array(F.collect_list(F.struct("k", "v"))))
                  .alias("properties"),
                  F.sum(F.when(F.col("n_vals") > 1, 1).otherwise(0))
                  .cast("long").alias("n_conflicts")))
    return (support.join(props, keys, "left")
            .withColumn("properties",
                        F.coalesce("properties",
                                   F.map_from_entries(F.array().cast(
                                       "array<struct<k:string,v:string>>"))))
            .withColumn("n_conflicts",
                        F.coalesce("n_conflicts", F.lit(0).cast("long"))))
