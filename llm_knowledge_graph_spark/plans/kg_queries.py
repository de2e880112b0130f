"""KG-pipeline queries for the driver (rows-only checks — the pipeline is
not expressible in ANSI SQL; fidelity is proven against the plain-Python
oracle in the pytest suite instead).

Each callable synthesizes the deterministic fixture corpus (BASELINE.md:
"synthesise it deterministically at small scale"), builds the KG once per
(session, corpus-size) via a module-level cache, and returns a query over
the materialized graph.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from . import queries as Q

_CACHE: Dict[Tuple[int, int], object] = {}
_CORPUS_PAGES = 150


def _kg(spark: SparkSession, n_pages: int = _CORPUS_PAGES):
    key = (id(spark), n_pages)
    if key not in _CACHE:
        from ..plans.pipeline import build_kg
        from ..sources.pages import synthesize_pages
        pages = synthesize_pages(spark, n_pages, seed=42)
        _CACHE[key] = build_kg(spark, pages, PipelineConfig())
    return _CACHE[key]


def kg_node_counts(spark, sf_dir):
    """Q2 analogue: per-label node counts (ref check_db_schema.py:23-31)."""
    res = _kg(spark)
    return Q.node_counts(res.canonical_nodes)


def kg_edge_counts(spark, sf_dir):
    res = _kg(spark)
    return Q.edge_counts(res.canonical_edges)


def kg_degree_top25(spark, sf_dir):
    """Flagship: top-25 entities by degree over canonical edges."""
    res = _kg(spark)
    return Q.degree_topk(res.canonical_edges, k=25)


def kg_multi_hop(spark, sf_dir):
    """Q7 analogue: 2-hop neighborhood of the hot entity."""
    from ..corpus import HOT_PERSON
    res = _kg(spark)
    return Q.multi_hop(res.canonical_edges, HOT_PERSON, depth=2)


def kg_entity_contains(spark, sf_dir):
    """Q8 'toLower CONTAINS' template."""
    res = _kg(spark)
    return Q.find_by_name_contains(res.canonical_nodes, "doe", limit=25)


def kg_linking_mapping(spark, sf_dir):
    """Entity-linking output: non-identity alias → canonical rewrites."""
    res = _kg(spark)
    return (res.mapping.filter(F.col("id") != F.col("canonical_id"))
            .orderBy("type", "id"))


def kg_minhash_near_dup_docs(spark, sf_dir):
    """MinHash-LSH near-duplicate detection on the documents table
    (driver table; rows-only — MinHash is not ANSI-SQL-expressible)."""
    from ..operators.dedup import minhash_lsh_near_dups
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (minhash_lsh_near_dups(d, "doc_id", "text",
                                  shingle_words=3, jaccard_threshold=0.5)
            .orderBy("a", "b"))


def kg_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs on documents (rows-only)."""
    from ..operators.dedup import simhash_near_dups
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (simhash_near_dups(d, "doc_id", "text", max_hamming=10)
            .orderBy("a", "b"))


def kg_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbors (scale path of
    cosine_topk; rows-only — approximate by design)."""
    from ..operators.similarity import lsh_ann_topk
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    return lsh_ann_topk(e.filter(F.col("vec_id") != 0), qvec, k=10)


def kg_multimodal_features(spark, sf_dir):
    """Multimodal plumbing: deterministic fake decode over binary payloads
    (rows-only; the real decoder is stubbed — see operators/multimodal.py)."""
    from ..operators.multimodal import extract_features, synthesize_media
    media = synthesize_media(spark, n=48)
    feats = extract_features(media, fake=True)
    return (feats.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"))
        .orderBy("kind"))


KG_QUERIES = {
    "kg_node_counts": kg_node_counts,
    "kg_edge_counts": kg_edge_counts,
    "kg_degree_top25": kg_degree_top25,
    "kg_multi_hop": kg_multi_hop,
    "kg_entity_contains": kg_entity_contains,
    "kg_linking_mapping": kg_linking_mapping,
    "kg_minhash_near_dup_docs": kg_minhash_near_dup_docs,
    "kg_simhash_pairs": kg_simhash_pairs,
    "kg_ann_lsh_topk": kg_ann_lsh_topk,
    "kg_multimodal_features": kg_multimodal_features,
}
