"""Triple extraction + per-chunk graph-document assembly — the flagship
operator (E4 analogue; ref schema_driven_extraction code/pdf_graphrag.py:692-750
and convert_to_graph_document :393-500).

Spark-first design:
  * The reference fans out one LLM call per chunk via asyncio
    (code/pdf_graphrag.py:754-781); here Spark task parallelism IS the
    fan-out and the "model" is the deterministic extractor running inside an
    Arrow-batched pandas UDF (north rule: batched pandas/Arrow UDFs, no
    per-row Python at the Spark level). Swapping in a real ONNX-quantized
    extractor means replacing `extract_chunk` with a session held in a
    module-level cache (loaded once per executor) — the operator shape,
    schema and batching stay identical.
  * Endpoint resolution (ref :459-468, an O(V·E) list scan per chunk) is
    chunk-local, so it stays inside the UDF as an O(V+E) dict lookup —
    data-parallel, zero shuffle. Cross-chunk merging is the next stage.
  * One UDF evaluation emits BOTH node and edge arrays as a single struct;
    callers persist the intermediate and explode twice, so extraction runs
    once per chunk.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..reference_impl import build_graph_document, extract_chunk, strict_mode_filter

GD_TYPE = (
    "struct<"
    "nodes:array<struct<id:string,type:string,properties:map<string,string>>>,"
    "edges:array<struct<subj:string,subj_type:string,pred:string,"
    "obj:string,obj_type:string,properties:map<string,string>>>"
    ">"
)


def make_graphdoc_udf(with_embedding: bool = False,
                      allowed_entities: Optional[list] = None,
                      allowed_relationships: Optional[list] = None):
    """Builds the per-chunk extraction UDF. Chunk-node ids are scoped by url
    (`<url>#chunk_<i>`) because the reference's `chunk_{i}` (ref :406) is
    only unique within one document."""

    def _one(url: str, chunk_id: int, text: str) -> dict:
        gd = build_graph_document(
            extract_chunk(text or ""), chunk_id, text or "",
            page=0, with_embedding=with_embedding,
        )
        if allowed_entities is not None or allowed_relationships is not None:
            gd = strict_mode_filter(gd, allowed_entities or [],
                                    allowed_relationships or [])
        prefix = f"{url}#chunk_{chunk_id}"
        for n in gd["nodes"]:
            if n["type"] == "Chunk":
                n["id"] = prefix
        for e in gd["edges"]:
            if e["subj_type"] == "Chunk":
                e["subj"] = prefix
        return gd

    @pandas_udf(GD_TYPE)
    def graphdoc_udf(url: pd.Series, chunk_id: pd.Series,
                     text: pd.Series) -> pd.DataFrame:
        out = [
            _one(u, int(c), t)
            for u, c, t in zip(url, chunk_id, text)
        ]
        return pd.DataFrame(out)

    return graphdoc_udf


def with_graph_docs(chunks: DataFrame, with_embedding: bool = False,
                    allowed_entities: Optional[list] = None,
                    allowed_relationships: Optional[list] = None) -> DataFrame:
    """chunks(url, chunk_id, text) → + `gd` struct column (persist me)."""
    udf = make_graphdoc_udf(with_embedding, allowed_entities,
                            allowed_relationships)
    return chunks.withColumn(
        "gd", udf(F.col("url"), F.col("chunk_id"), F.col("text"))
    )


def nodes_from(gd_df: DataFrame) -> DataFrame:
    """→ raw per-chunk nodes with lineage (url, chunk_id)."""
    return gd_df.select(
        "url", "chunk_id", F.explode(F.col("gd.nodes")).alias("n")
    ).select(
        F.col("n.id").alias("id"),
        F.col("n.type").alias("type"),
        F.col("n.properties").alias("properties"),
        "url", "chunk_id",
    )


def edges_from(gd_df: DataFrame) -> DataFrame:
    """→ raw per-chunk edges (triples) with lineage (url, chunk_id)."""
    return gd_df.select(
        "url", "chunk_id", F.explode(F.col("gd.edges")).alias("e")
    ).select(
        F.col("e.subj").alias("subj"),
        F.col("e.subj_type").alias("subj_type"),
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        F.col("e.obj_type").alias("obj_type"),
        F.col("e.properties").alias("properties"),
        "url", "chunk_id",
    )
