"""End-to-end KG construction pipeline (the Spark equivalent of
PDFGraphRAG.process, ref code/pdf_graphrag.py:800-853 — see SURVEY §3.1).

    pages ─filter(lang)─ html→text ─chunk─ extract(mapInPandas)
          ─[per-chunk normalize + HAS]─ merge nodes/edges (N10)
          ─minhash-LSH link─ connected components─ canonical rewrite
          ─materialize (subject-hash buckets + salt) + metrics

Everything before `merge` is shuffle-free (chunk-local); merge and linking
are single hash-aggregation / bucket-join shuffles; components iterates on
a frontier that is tiny relative to the corpus (distinct linked names only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators import chunker, components, extract, html_text, linking, merge
from ..operators import materialize


@dataclass
class KGResult:
    chunks: DataFrame
    nodes: DataFrame          # merged, pre-canonicalization
    edges: DataFrame
    sim_edges: DataFrame      # entity-linking similarity edges
    mapping: DataFrame        # (type, id, canonical_id)
    canonical_nodes: DataFrame
    canonical_edges: DataFrame


def build_kg(spark: SparkSession, pages: DataFrame,
             cfg: PipelineConfig = PipelineConfig(),
             alias_dict: Optional[DataFrame] = None) -> KGResult:
    pages = html_text.filter_langs(pages, cfg.supported_langs)
    pages = html_text.with_extracted_text(pages)
    chunks = chunker.chunk_pages(pages, cfg.chunk_size, cfg.chunk_overlap)

    gd = extract.with_graph_docs(
        chunks, with_embedding=cfg.with_chunk_embeddings,
        allowed_entities=cfg.allowed_entities,
        allowed_relationships=cfg.allowed_relationships,
    ).persist()

    # persisted: consumed by linking, mapping, canonical rewrite and callers
    nodes = merge.merge_nodes(extract.nodes_from(gd)).persist()
    edges = merge.merge_edges(extract.edges_from(gd)).persist()

    # entity linking + canonicalization (north rule; beyond the reference's
    # exact-(label,id) MERGE — ref code/pdf_graphrag.py:277-300)
    entity_nodes = nodes.filter(F.col("type") != "Chunk")
    sim = linking.similarity_edges(
        entity_nodes, cfg.minhash_permutations, cfg.lsh_bands,
        cfg.shingle_size, cfg.jaccard_threshold, cfg.link_types,
    )
    if alias_dict is not None:
        sim = sim.unionByName(
            linking.alias_dictionary_links(entity_nodes, alias_dict))
    sim = sim.persist()
    mapping = components.canonical_mapping(
        entity_nodes.select("id", "type"), sim, cfg.max_cc_iterations
    ).persist()

    canonical_nodes, canonical_edges = rewrite_canonical(nodes, edges, mapping)
    return KGResult(chunks, nodes, edges, sim, mapping,
                    canonical_nodes, canonical_edges)


def rewrite_canonical(nodes: DataFrame, edges: DataFrame,
                      mapping: DataFrame):
    """Rewrites node ids / edge endpoints to canonical ids and re-dedups.

    The mapping is small (distinct entity names only) → broadcast joins; no
    large-table shuffle except the final dedup aggregations.
    """
    m = F.broadcast(mapping)

    canon_nodes = (
        nodes.join(m, ["type", "id"], "left")
        .withColumn("canonical_id", F.coalesce("canonical_id", "id"))
        .drop("id").withColumnRenamed("canonical_id", "id")
    )
    canon_nodes = merge.merge_nodes(canon_nodes)

    ms = m.select(F.col("type").alias("subj_type"), F.col("id").alias("subj"),
                  F.col("canonical_id").alias("subj_canon"))
    mo = m.select(F.col("type").alias("obj_type"), F.col("id").alias("obj"),
                  F.col("canonical_id").alias("obj_canon"))
    canon_edges = (
        edges.join(F.broadcast(ms), ["subj_type", "subj"], "left")
        .join(F.broadcast(mo), ["obj_type", "obj"], "left")
        .withColumn("subj", F.coalesce("subj_canon", "subj"))
        .withColumn("obj", F.coalesce("obj_canon", "obj"))
        .drop("subj_canon", "obj_canon")
    )
    canon_edges = merge.merge_edges(canon_edges)
    return canon_nodes, canon_edges


def build_and_write(spark: SparkSession, pages: DataFrame, out_dir: str,
                    cfg: PipelineConfig = PipelineConfig(),
                    alias_dict: Optional[DataFrame] = None) -> KGResult:
    res = build_kg(spark, pages, cfg, alias_dict)
    materialize.write_graph(res.canonical_nodes, res.canonical_edges, out_dir,
                            cfg.n_subject_buckets, cfg.hot_subject_salt)
    return res
