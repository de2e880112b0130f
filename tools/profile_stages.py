"""Per-stage wall-time profiler for the KG pipeline (perf tuning aid).

Usage: python tools/profile_stages.py [cores] [n_pages]
Synthesizes the corpus to parquet once (cached across runs), then times
each pipeline phase separately so serial/driver-side costs are visible.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from llm_knowledge_graph_spark.config import PipelineConfig  # noqa: E402
from llm_knowledge_graph_spark.operators import (components, extract,  # noqa: E402
                                                 html_text, linking, merge)
from llm_knowledge_graph_spark.plans import pipeline as P  # noqa: E402
from llm_knowledge_graph_spark.session import get_spark  # noqa: E402
from llm_knowledge_graph_spark.sources.pages import (read_pages,  # noqa: E402
                                                     synthesize_pages,
                                                     write_pages)


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    path = f"/tmp/scaling_pages_{n_pages}"

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(path + "/_SUCCESS"):
        write_pages(synthesize_pages(spark, n_pages, seed=42,
                                     parallelism=256), path)

    cfg = PipelineConfig()
    pages = read_pages(spark, path).repartition(4 * cores).persist()
    pages.count()

    # warmup python workers
    warm = P.build_kg(spark, pages.limit(64), cfg)
    warm.canonical_edges.count()

    t = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = time.perf_counter() - t0
        print(f"  {name:28s} {t[name]:7.2f}s", flush=True)
        return out

    t0_all = time.perf_counter()
    pgs = html_text.filter_langs(pages, cfg.supported_langs)
    flat = extract.extract_pages_flat(
        pgs, cfg.chunk_size, cfg.chunk_overlap,
        with_embedding=cfg.with_chunk_embeddings).persist()
    clock("extract(flat persist+count)", lambda: flat.count())

    nodes_raw = extract.nodes_from_flat(flat)
    edges_raw = extract.edges_from_flat(flat)
    entity_merged = clock("merge_nodes ckpt", lambda: merge.merge_nodes(
        nodes_raw.filter(F.col("type") != "Chunk")).localCheckpoint())
    rel_merged = clock("merge_edges ckpt", lambda: merge.merge_edges(
        edges_raw.filter(F.col("pred") != "HAS")).localCheckpoint())

    sim = clock("linking ckpt", lambda: linking.similarity_edges(
        entity_merged, cfg.minhash_permutations, cfg.lsh_bands,
        cfg.shingle_size, cfg.jaccard_threshold, cfg.link_types,
    ).localCheckpoint())
    print(f"  sim edges: {sim.count()}")

    mapping = clock("canonical_mapping", lambda: components.canonical_mapping(
        entity_merged.select("id", "type"), sim, cfg.max_cc_iterations))

    chunk_nodes = nodes_raw.filter(F.col("type") == "Chunk")
    has_edges = edges_raw.filter(F.col("pred") == "HAS")
    nodes = entity_merged.unionByName(
        chunk_nodes.select(*entity_merged.columns))
    edges = rel_merged.unionByName(has_edges.select(*rel_merged.columns))
    cn, ce = P.rewrite_canonical(nodes, edges, mapping)
    clock("canonical_edges.count", lambda: ce.count())
    clock("canonical_nodes.count", lambda: cn.count())

    total = time.perf_counter() - t0_all
    print(f"  {'TOTAL':28s} {total:7.2f}s  (sum {sum(t.values()):.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
