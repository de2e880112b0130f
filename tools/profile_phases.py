"""Phase-level timing of the KG build at one taskset-bounded core count.

Breaks the build into its materialization points so the serial (non-
scaling) fraction can be attributed:

  extract+merge  — fused mapInPandas + the two merged localCheckpoints
  link           — minhash/LSH similarity edges localCheckpoint
  mapping        — canonical_mapping (limit-probe collect + union-find)
  rewrite+count  — canonical rewrite plan + the single count action

Usage: taskset is applied INSIDE (subprocess per level like scaling_bench):
  python tools/profile_phases.py <cores> [n_pages] [trials]
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from llm_knowledge_graph_spark.session import get_spark
from llm_knowledge_graph_spark.sources.pages import read_pages
from llm_knowledge_graph_spark.config import PipelineConfig
from llm_knowledge_graph_spark.plans.pipeline import build_kg
from llm_knowledge_graph_spark.operators import (chunker, components, extract,
                                                 html_text, linking, merge)
from llm_knowledge_graph_spark.plans import pipeline as P
from pyspark.sql import functions as F
from concurrent.futures import ThreadPoolExecutor

cores, path, trials = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
pages = read_pages(spark, path).repartition(4 * cores).persist()
n = pages.count()
warm = build_kg(spark, pages.limit(64), PipelineConfig())
warm.canonical_edges.count()

cfg = PipelineConfig()
for t in range(trials):
    spark.catalog.clearCache()
    pages.persist(); pages.count()
    marks = []
    t0 = time.perf_counter()
    def mark(name):
        marks.append((name, time.perf_counter() - t0))

    pg = html_text.filter_langs(pages, cfg.supported_langs)
    flat = extract.extract_pages_flat(
        pg, cfg.chunk_size, cfg.chunk_overlap,
        with_embedding=cfg.with_chunk_embeddings).persist()
    nodes_raw = extract.nodes_from_flat(flat)
    edges_raw = extract.edges_from_flat(flat)
    chunk_nodes = nodes_raw.filter(F.col("type") == "Chunk")
    has_edges = extract.has_edges_from_nodes(nodes_raw)
    with ThreadPoolExecutor(2) as pool:
        f_nodes = pool.submit(lambda: merge.merge_nodes(
            nodes_raw.filter(F.col("type") != "Chunk")).localCheckpoint())
        f_edges = pool.submit(lambda: merge.merge_edges(
            edges_raw.filter(F.col("pred") != "HAS")).localCheckpoint())
        entity_merged, rel_merged = f_nodes.result(), f_edges.result()
    mark("extract+merge")

    nodes = entity_merged.unionByName(chunk_nodes.select(*entity_merged.columns))
    edges = rel_merged.unionByName(has_edges.select(*rel_merged.columns))
    sim = linking.similarity_edges(
        entity_merged, cfg.minhash_permutations, cfg.lsh_bands,
        cfg.shingle_size, cfg.jaccard_threshold, cfg.link_types,
    ).localCheckpoint()
    mark("link")

    mapping = components.canonical_mapping(
        entity_merged.select("id", "type"), sim, cfg.max_cc_iterations)
    mark("mapping")

    cn, ce = P.rewrite_canonical(nodes, edges, mapping)
    rows = (cn.select(F.lit("n").alias("k"))
            .unionAll(ce.select(F.lit("e").alias("k")))
            .groupBy("k").count().collect())
    mark("rewrite+count")
    total = time.perf_counter() - t0
    prev = 0.0
    out = []
    for name, at in marks:
        out.append(f"{{name}}={{at - prev:.2f}}s")
        prev = at
    print(f"# trial {{t}} cores={{cores}} total={{total:.2f}}s  " + "  ".join(out),
          file=sys.stderr)
    print(f"{{total:.3f}} " + " ".join(f"{{at - b:.3f}}" for (_, at), (_, b) in
          zip(marks, [("", 0.0)] + marks[:-1])))
spark.stop()
"""


def main():
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    path = f"/tmp/scaling_pages_{n_pages}"
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", RUNNER.format(repo=str(REPO)),
         str(cores), path, str(trials)],
        capture_output=True, text=True, timeout=3600)
    sys.stderr.write(out.stderr[-3000:])
    print(out.stdout)


if __name__ == "__main__":
    main()
