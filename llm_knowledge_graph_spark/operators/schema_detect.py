"""E1+E3: open-domain schema detection + refinement as pipeline stages.

Reference behavior (re-expressed Spark-first, no code reuse):
  * E1 open_domain_detection (ref code/pdf_graphrag.py:577-616): one LLM
    call PER CHUNK proposing {list_nodes, list_relationships} label
    vocabularies (response schema ref code/prompts.py:200-223), fanned out
    with asyncio (ref :620-643). Here: ONE mapInPandas stage over pages —
    html→text + coarse chunking (1200/200, the schema-pass params ref :811)
    + the deterministic proposer (reference_impl.propose_chunk_schema), all
    fused like extract.extract_pages_flat so the corpus crosses Arrow once.
    Spark task parallelism IS the fan-out (SURVEY §2.3 E2).
  * E3 schema_refinement (ref :648-687): one LLM consolidation call. Here:
    a global `collect_set` aggregation over the exploded proposals — the
    vocabulary is tiny (bounded by distinct label strings, not corpus
    size) — followed by the deterministic canonicalizer the reference's
    prompt rules demand (PROMPTS.md: singular PascalCase labels,
    UPPER_SNAKE relationship types). Canonicalization runs driver-side on
    the collected set because it must use exact Python `.capitalize()`
    semantics (never `initcap`) and the set is broadcast-small by
    construction.

Scale shape: the proposal stage is embarrassingly parallel and shuffle-free
(chunk-local); the consolidation is one partial-aggregated collect_set whose
state is the distinct-label set (dozens of strings at any corpus size) — the
whole stage is corpus-scan-bound, exactly like extraction.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..reference_impl import (SCHEMA_CHUNK_OVERLAP, SCHEMA_CHUNK_SIZE,
                              refine_schema)

PROPOSAL_SCHEMA = "url string, chunk_id long, kind string, name string"


def propose_schemas(pages: DataFrame,
                    chunk_size: int = SCHEMA_CHUNK_SIZE,
                    overlap: int = SCHEMA_CHUNK_OVERLAP) -> DataFrame:
    """pages(url, html, text) → long-format per-chunk label proposals:
    (url, chunk_id, kind 'label'|'rel', name raw-label). Fused
    html→text + coarse-chunk + propose in one Python crossing."""
    from typing import Iterator

    from ..reference_impl import chunk_text, html_to_text, propose_chunk_schema

    def gen(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            c_url: list = []
            c_cid: list = []
            c_kind: list = []
            c_name: list = []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                if text is None:
                    text = html_to_text(html)
                for cid, ctext, _cs, _ce in chunk_text(text, chunk_size,
                                                       overlap):
                    prop = propose_chunk_schema(ctext)
                    for name in prop["list_nodes"]:
                        c_url.append(url); c_cid.append(cid)
                        c_kind.append("label"); c_name.append(name)
                    for name in prop["list_relationships"]:
                        c_url.append(url); c_cid.append(cid)
                        c_kind.append("rel"); c_name.append(name)
            yield pd.DataFrame({"url": c_url, "chunk_id": c_cid,
                                "kind": c_kind, "name": c_name})

    return (pages.select(
        "url",
        F.when(F.col("text").isNull(), F.col("html")).alias("html"),
        "text",
    ).mapInPandas(gen, PROPOSAL_SCHEMA))


def detect_schema(pages: DataFrame,
                  chunk_size: int = SCHEMA_CHUNK_SIZE,
                  overlap: int = SCHEMA_CHUNK_OVERLAP) -> Dict[str, List[str]]:
    """E1+E3 end-to-end: per-chunk proposals → global collect_set →
    deterministic canonicalization. Returns {"nodes": [...PascalCase...],
    "relationships": [...UPPER_SNAKE...]}, sorted — identical to the
    plain-Python oracle reference_impl.reference_detect_schema."""
    props = propose_schemas(pages, chunk_size, overlap)
    agg = (props.groupBy("kind")
           .agg(F.collect_set("name").alias("names"))
           .collect())
    raw = {row["kind"]: row["names"] for row in agg}
    # one synthetic "proposal" carrying the global vocabulary — the
    # canonicalizer is a set-map, so grouping granularity doesn't matter
    return refine_schema([{
        "list_nodes": raw.get("label", []),
        "list_relationships": raw.get("rel", []),
    }])


def schema_as_df(pages: DataFrame,
                 chunk_size: int = SCHEMA_CHUNK_SIZE,
                 overlap: int = SCHEMA_CHUNK_OVERLAP) -> DataFrame:
    """Detected schema as a (kind, name) DataFrame — the driver-query /
    introspection surface (mirrors kg_schema_labels' shape)."""
    schema = detect_schema(pages, chunk_size, overlap)
    spark = pages.sparkSession
    rows = ([("label", n) for n in schema["nodes"]]
            + [("relationship", r) for r in schema["relationships"]])
    return spark.createDataFrame(rows, "kind string, name string")
