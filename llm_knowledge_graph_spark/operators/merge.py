"""Cross-chunk entity/edge merging (N10 analogue).

The reference merges entities with Neo4j `MERGE (n:{type} {id}) SET n +=
props` and edges with `MERGE (a)-[r:TYPE]->(b)` one Cypher round-trip at a
time (ref code/pdf_graphrag.py:272-300). Here the same semantics are ONE
hash aggregation each:

  * nodes:  groupBy(type, id); property maps merged deterministically with
    last-writer-wins in (url, chunk_id) order — `SET n += props` applied in
    ingestion order. Implemented with explode + max_by (JVM-side, no UDF).
  * edges:  groupBy(subj, subj_type, pred, obj, obj_type); lineage keeps the
    FIRST witnessing chunk (min_by), matching MERGE's create-once.

Scale: both are map-side-combinable hash aggregations that shuffle on their
group keys once; skewed hot entities are handled by AQE + the salted
repartition at materialization time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_nodes(nodes_raw: DataFrame) -> DataFrame:
    """raw nodes(id,type,properties,url,chunk_id) → one row per (type,id)."""
    order = F.struct(F.col("url"), F.col("chunk_id"))
    kv = nodes_raw.select(
        "id", "type", "url", "chunk_id",
        F.explode_outer(F.col("properties")).alias("k", "v"),
    )
    merged_props = (
        kv.filter(F.col("k").isNotNull())
        .groupBy("type", "id", "k")
        .agg(F.max_by("v", order).alias("v"))
        .groupBy("type", "id")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("k", "v")))
        ).alias("properties"))
    )
    keys = (
        nodes_raw.groupBy("type", "id")
        .agg(F.min_by(F.struct("url", "chunk_id"), order).alias("first_seen"))
        .select("type", "id",
                F.col("first_seen.url").alias("url"),
                F.col("first_seen.chunk_id").alias("chunk_id"))
    )
    return (
        keys.join(merged_props, ["type", "id"], "left")
        .select("id", "type",
                F.coalesce("properties", F.map_from_entries(
                    F.array().cast("array<struct<k:string,v:string>>")
                )).alias("properties"),
                "url", "chunk_id")
    )


def merge_edges(edges_raw: DataFrame) -> DataFrame:
    """raw edges → one row per (subj, subj_type, pred, obj, obj_type) with
    merged properties and first-witness lineage."""
    gkeys = ["subj", "subj_type", "pred", "obj", "obj_type"]
    order = F.struct(F.col("url"), F.col("chunk_id"))
    kv = edges_raw.select(
        *gkeys, "url", "chunk_id",
        F.explode_outer(F.col("properties")).alias("k", "v"),
    )
    merged_props = (
        kv.filter(F.col("k").isNotNull())
        .groupBy(*gkeys, "k")
        .agg(F.max_by("v", order).alias("v"))
        .groupBy(*gkeys)
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("k", "v")))
        ).alias("properties"))
    )
    keys = (
        edges_raw.groupBy(*gkeys)
        .agg(F.min_by(F.struct("url", "chunk_id"), order).alias("first_seen"))
        .select(*gkeys,
                F.col("first_seen.url").alias("url"),
                F.col("first_seen.chunk_id").alias("chunk_id"))
    )
    return (
        keys.join(merged_props, gkeys, "left")
        .select(*gkeys,
                F.coalesce("properties", F.map_from_entries(
                    F.array().cast("array<struct<k:string,v:string>>")
                )).alias("properties"),
                "url", "chunk_id")
    )
