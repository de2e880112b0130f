"""Alias-dictionary linking path + strict-mode schema enforcement in the
Spark pipeline (N9 + the north rule's broadcast alias dictionary)."""

import pytest

from pyspark.sql import functions as F


@pytest.mark.heavy
def test_alias_dictionary_links(spark):
    from llm_knowledge_graph_spark.operators.linking import alias_dictionary_links
    entities = spark.createDataFrame(
        [("Big Blue", "Organization"), ("Ibm", "Organization"),
         ("Acme Corp", "Organization")],
        "id string, type string")
    alias_dict = spark.createDataFrame(
        [("big blue", "Ibm"), ("international business machines", "Ibm")],
        "alias string, canonical_id string")
    links = alias_dictionary_links(entities, alias_dict).collect()
    assert {(r.a, r.b) for r in links} == {("Big Blue", "Ibm")}


@pytest.mark.heavy
def test_alias_dictionary_cosine_gate(spark):
    """With an `embedding` column the dictionary link is cosine-gated:
    a name whose deterministic embedding matches the canonical vector
    passes a high threshold; a curated-but-textually-distant alias is
    dropped (hash embeddings of distinct strings are near-orthogonal —
    swap in a real encoder and the gate becomes semantic)."""
    from llm_knowledge_graph_spark.operators.linking import alias_dictionary_links
    from llm_knowledge_graph_spark.reference_impl import embed_text
    entities = spark.createDataFrame(
        [("ACME Corp", "Organization"), ("Globex Inc", "Organization")],
        "id string, type string")
    emb = embed_text("acme corp")
    alias_dict = spark.createDataFrame(
        [("acme corp", "Acme Corp", emb), ("globex inc", "Acme Corp", emb)],
        "alias string, canonical_id string, embedding array<float>")
    strict = alias_dictionary_links(entities, alias_dict,
                                    cosine_threshold=0.9).collect()
    assert {(r.a, r.b) for r in strict} == {("ACME Corp", "Acme Corp")}
    assert all(r.jaccard >= 0.9 for r in strict)
    loose = alias_dictionary_links(entities, alias_dict,
                                   cosine_threshold=-1.0).collect()
    assert {(r.a, r.b) for r in loose} == {("ACME Corp", "Acme Corp"),
                                           ("Globex Inc", "Acme Corp")}


@pytest.mark.heavy
def test_pipeline_with_alias_dict_merges_curated_aliases(spark, pages_df):
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    # curate an alias that trigram similarity would never find
    alias_dict = spark.createDataFrame(
        [("Globex Inc", "Acme Corp")], "alias string, canonical_id string")
    res = build_kg(spark, pages_df, PipelineConfig(), alias_dict=alias_dict)
    m = {(r.type, r.id): r.canonical_id for r in res.mapping.collect()}
    assert m.get(("Organization", "Globex Inc")) == "Acme Corp"
    # and the canonical graph no longer contains the alias as a node id
    ids = {r.id for r in res.canonical_nodes
           .filter(F.col("type") == "Organization").collect()}
    assert "Globex Inc" not in ids and "Acme Corp" in ids


@pytest.mark.heavy
def test_pipeline_strict_mode(spark, pages_df):
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    cfg = PipelineConfig(
        allowed_entities=["Person", "Organization"],
        allowed_relationships=["WORKS_FOR", "FOUNDED", "LEADS", "LOVES",
                               "MARRIED", "EMPLOYS"],
    )
    res = build_kg(spark, pages_df, cfg)
    types = {r.type for r in res.nodes.collect()}
    assert types <= {"Person", "Organization", "Chunk"}  # Chunk exempt
    preds = {r.pred for r in res.edges.collect()}
    assert preds <= {"WORKS_FOR", "FOUNDED", "LEADS", "LOVES", "MARRIED",
                     "EMPLOYS", "HAS"}  # HAS exempt
    # no dangling edges into dropped nodes
    node_keys = {(r.type, r.id) for r in res.nodes.collect()}
    for r in res.edges.collect():
        assert (r.subj_type, r.subj) in node_keys
        assert (r.obj_type, r.obj) in node_keys


@pytest.mark.heavy
def test_one_sided_strict_filter_leaves_other_dimension_unrestricted(
        spark, pages_df):
    """allowed_entities WITHOUT allowed_relationships must not drop every
    non-HAS relationship (None = unrestricted, not empty = nothing)."""
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg

    res = build_kg(spark, pages_df, PipelineConfig(
        allowed_entities=["Person", "Organization", "Place",
                          "Term", "Section"]))
    preds = {r["pred"] for r in
             res.canonical_edges.select("pred").distinct().collect()}
    assert "HAS" in preds
    assert len(preds - {"HAS"}) >= 3  # WORKS_FOR/FOUNDED/... survive

    res2 = build_kg(spark, pages_df, PipelineConfig(
        allowed_relationships=["WORKS_FOR", "FOUNDED"]))
    types = {r["type"] for r in
             res2.canonical_nodes.select("type").distinct().collect()}
    assert {"Person", "Organization"} <= types  # nodes unrestricted
    preds2 = {r["pred"] for r in
              res2.canonical_edges.select("pred").distinct().collect()}
    assert preds2 <= {"HAS", "WORKS_FOR", "FOUNDED"}
