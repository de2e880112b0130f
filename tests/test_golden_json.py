"""K3/S4 golden-JSON sink + source roundtrip."""

from __future__ import annotations


def _node_set(df):
    return {(r["url"], r["chunk_id"], r["id"], r["type"],
             tuple(sorted((r["properties"] or {}).items())))
            for r in df.collect()}


def _edge_set(df):
    return {(r["url"], r["chunk_id"], r["subj"], r["pred"], r["obj"],
             r["subj_type"], r["obj_type"],
             tuple(sorted((r["properties"] or {}).items())))
            for r in df.collect()}


def test_graph_docs_json_roundtrip(spark, kg_result, tmp_path):
    from llm_knowledge_graph_spark.sources import golden_json as GJ
    path = str(tmp_path / "graph_docs_json")
    nodes, edges = kg_result.nodes, kg_result.edges
    GJ.write_graph_docs_json(nodes, edges, path)
    gd = GJ.read_graph_docs_json(spark, path)
    assert _node_set(GJ.nodes_from_graph_docs(gd)) == _node_set(nodes)
    assert _edge_set(GJ.edges_from_graph_docs(gd)) == _edge_set(edges)


def test_graph_docs_grouping_covers_every_chunk(spark, kg_result):
    """Every (url, chunk_id) with a node or an edge appears exactly once —
    the GraphDocument grouping invariant (one doc per chunk)."""
    from pyspark.sql import functions as F

    from llm_knowledge_graph_spark.sources import golden_json as GJ
    gd = GJ.graph_docs(kg_result.nodes, kg_result.edges)
    assert gd.groupBy("url", "chunk_id").count() \
        .filter(F.col("count") > 1).count() == 0
    n_keys = kg_result.nodes.select("url", "chunk_id").distinct().count()
    assert gd.count() >= n_keys


def test_golden_artifact_deterministic(spark, kg_result, tmp_path):
    """Two writes of the same graph produce identical artifact content
    (sorted arrays → a diffable golden file, the GRAPH_DOCS.json role)."""
    from llm_knowledge_graph_spark.sources import golden_json as GJ
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    GJ.write_graph_docs_json(kg_result.nodes, kg_result.edges, p1)
    GJ.write_graph_docs_json(kg_result.nodes, kg_result.edges, p2)
    r1 = sorted(r["value"] for r in spark.read.text(p1).collect())
    r2 = sorted(r["value"] for r in spark.read.text(p2).collect())
    assert r1 == r2 and len(r1) > 0
