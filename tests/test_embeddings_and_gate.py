"""Typed chunk-embeddings table (K4) + V4 confidence gate."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F


def test_chunk_embeddings_match_reference(spark, kg_result, fixture_pages):
    """Typed table rows must equal reference_impl.embed_text on the same
    chunk texts (bit-parity within float32 storage)."""
    from llm_knowledge_graph_spark.reference_impl import (
        SUPPORTED_LANGS, chunk_text, embed_text, html_to_text)
    expected = {}
    for row in fixture_pages:
        if row["lang"] not in SUPPORTED_LANGS:
            continue
        text = row["text"] if row["text"] is not None \
            else html_to_text(row["html"])
        for cid, ctext, _s, _e in chunk_text(text):
            expected[(row["url"], cid)] = embed_text(ctext)
    got = {(r["url"], r["chunk_id"]): r["embedding"]
           for r in kg_result.chunk_embeddings.collect()}
    assert set(got) == set(expected)
    for key, vec in got.items():
        exp = expected[key]
        assert len(vec) == len(exp) == 64
        assert all(abs(a - b) < 1e-6 for a, b in zip(vec, exp))
        # unit-norm invariant of the encoder
        assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-4


def test_embeddings_write_read_roundtrip(spark, kg_result, tmp_path):
    from llm_knowledge_graph_spark.operators import embed
    out = str(tmp_path / "graph")
    embed.write_embeddings(kg_result.chunk_embeddings, out, n_buckets=8)
    back = embed.read_embeddings(spark, out)
    a = {(r["url"], r["chunk_id"]): tuple(r["embedding"])
         for r in kg_result.chunk_embeddings.collect()}
    b = {(r["url"], r["chunk_id"]): tuple(r["embedding"])
         for r in back.collect()}
    assert a == b


def test_chunk_cosine_topk_selfhit(spark, kg_result):
    """Querying with an existing chunk's own embedding must rank that chunk
    first with score 1 (cosine self-similarity)."""
    from llm_knowledge_graph_spark.operators import embed
    probe = kg_result.chunk_embeddings.orderBy("url", "chunk_id").first()
    top = embed.chunk_cosine_topk(
        kg_result.chunk_embeddings, list(probe["embedding"]), k=3).collect()
    assert top[0]["rank"] == 1
    assert (top[0]["url"], top[0]["chunk_id"]) == \
        (probe["url"], probe["chunk_id"])


@pytest.mark.heavy
def test_confidence_gate_commits_and_blocks(spark, pages_df, tmp_path):
    """Both V4 gate outcomes (ref legal_graphrag.py:619-626): the fixture
    corpus validates clean (confidence 1.0 ≥ 0.99 → commit); an impossible
    threshold blocks the graph write and leaves metrics only."""
    import os

    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.operators import validate
    from llm_knowledge_graph_spark.plans.pipeline import build_and_write

    ok_dir = str(tmp_path / "ok")
    res = build_and_write(spark, pages_df, ok_dir,
                          PipelineConfig(confidence_threshold=0.99))
    assert res.committed is True
    assert os.path.isdir(f"{ok_dir}/nodes")
    assert os.path.isdir(f"{ok_dir}/edges")
    assert os.path.isdir(f"{ok_dir}/embeddings")
    scores = validate.validation_scores(res.canonical_nodes)
    assert scores["confidence"] >= 0.99

    blocked_dir = str(tmp_path / "blocked")
    res2 = build_and_write(spark, pages_df, blocked_dir,
                           PipelineConfig(confidence_threshold=1.5))
    assert res2.committed is False
    assert not os.path.isdir(f"{blocked_dir}/nodes")
    assert not os.path.isdir(f"{blocked_dir}/edges")
    assert os.path.isdir(f"{blocked_dir}/metrics")


def test_validation_scores_empty_classes_score_one(spark):
    """Reference empty-list semantics (ref :281-283, :296-298): no Section
    or Term nodes → V1/V2 = 1.0; completeness reflects missing classes."""
    from llm_knowledge_graph_spark.operators import validate
    nodes = spark.createDataFrame(
        [("A", "Person", {"name": "A"}), ("B", "Organization", {"name": "B"})],
        "id string, type string, properties map<string,string>")
    s = validate.validation_scores(nodes)
    assert s["citation_format_validity"] == 1.0
    assert s["definition_validity"] == 1.0
    assert abs(s["completeness"] - 2 / 5) < 1e-9
    assert abs(s["confidence"] - (1 + 1 + 2 / 5) / 3) < 1e-9


@pytest.mark.heavy
def test_node_and_relationship_embeddings(spark, kg_result):
    """K4 node/relationship vector indexes: exact-name probe ranks the
    entity itself first (encoder determinism ⇒ cosine 1.0); relationship
    index has one row per distinct non-HAS triple."""
    from llm_knowledge_graph_spark.operators import embed
    from llm_knowledge_graph_spark.reference_impl import embed_text

    nemb = embed.node_embeddings(kg_result.canonical_nodes)
    assert nemb.filter("type = 'Chunk'").count() == 0
    probe = nemb.orderBy("type", "id").first()
    top = embed.entity_cosine_topk(nemb, embed_text(probe["id"]), k=3).collect()
    assert (top[0]["type"], top[0]["id"]) == (probe["type"], probe["id"])

    remb = embed.relationship_embeddings(kg_result.canonical_edges)
    n_distinct = (kg_result.canonical_edges.filter("pred != 'HAS'")
                  .select("subj", "pred", "obj").distinct().count())
    assert remb.count() == n_distinct
    # VALUE check (review finding, round 3: count + dim alone pass even
    # if the wrong string is embedded): each vector must equal the
    # encoder output for the verbalized 'subj pred obj' triple
    import math
    for r in remb.orderBy("subj", "pred", "obj").limit(5).collect():
        want = embed_text(f"{r.subj} {r.pred} {r.obj}")
        assert len(r.embedding) == 64
        # float32 storage vs float64 oracle: tolerance covers the cast
        assert all(math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-6)
                   for a, b in zip(r.embedding, want)), (r.subj, r.pred)
