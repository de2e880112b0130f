"""E1+E3 schema detection/refinement: Spark stage vs plain-Python oracle,
and the detect→refine→enforce loop vs an explicit fixed-schema run."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_propose_chunk_schema_unit():
    from llm_knowledge_graph_spark.reference_impl import propose_chunk_schema
    text = ('John Doe works for Acme Corp. "Agreement" means the deal. '
            "Section 3: General Provisions. § 3 cites § 4.")
    prop = propose_chunk_schema(text)
    assert prop["list_nodes"] == ["person", "organization", "term", "section"]
    assert prop["list_relationships"] == ["works for", "cites"]


def test_refine_schema_canonicalizes_and_sorts():
    from llm_knowledge_graph_spark.reference_impl import refine_schema
    out = refine_schema([
        {"list_nodes": ["person", "ORGANIZATION"],
         "list_relationships": ["works for"]},
        {"list_nodes": ["Person", "place"],
         "list_relationships": ["Works For", "cites"]},
    ])
    # PascalCase labels, UPPER_SNAKE rels, case-insensitive dedupe, sorted
    assert out["nodes"] == ["Organization", "Person", "Place"]
    assert out["relationships"] == ["CITES", "WORKS_FOR"]


def test_spark_detect_matches_reference(spark, pages_df, fixture_pages):
    from llm_knowledge_graph_spark.operators import html_text, schema_detect
    from llm_knowledge_graph_spark.reference_impl import reference_detect_schema
    expected = reference_detect_schema(fixture_pages)
    got = schema_detect.detect_schema(
        html_text.filter_langs(pages_df, ("en",)))
    assert got == expected
    # the fixture corpus exercises every extractor entity class
    assert set(expected["nodes"]) >= {"Person", "Organization", "Section"}
    assert len(expected["relationships"]) >= 3


@pytest.mark.heavy
def test_detect_refine_enforce_reproduces_fixed_schema_run(spark, pages_df):
    """The auto_schema pipeline (detect → refine → strict-enforce) must
    equal a run given the detected schema explicitly as the fixed allowed
    lists — the reference's closed-domain path (ref :235-242)."""
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.operators import html_text, schema_detect
    from llm_knowledge_graph_spark.plans.pipeline import build_kg

    detected = schema_detect.detect_schema(
        html_text.filter_langs(pages_df, ("en",)))
    auto = build_kg(spark, pages_df, PipelineConfig(auto_schema=True))
    fixed = build_kg(spark, pages_df, PipelineConfig(
        allowed_entities=detected["nodes"],
        allowed_relationships=detected["relationships"]))

    def node_set(res):
        return {(r["type"], r["id"])
                for r in res.canonical_nodes.select("type", "id").collect()}

    def edge_set(res):
        return {(r["subj"], r["pred"], r["obj"]) for r in
                res.canonical_edges.select("subj", "pred", "obj").collect()}

    assert node_set(auto) == node_set(fixed)
    assert edge_set(auto) == edge_set(fixed)
    # the detected schema covers the extractor's vocabulary, so enforcing
    # it must not drop anything vs the unconstrained run
    free = build_kg(spark, pages_df, PipelineConfig())
    assert node_set(auto) == node_set(free)
    assert edge_set(auto) == edge_set(free)


def test_schema_as_df_shape(spark, pages_df):
    from llm_knowledge_graph_spark.operators import html_text, schema_detect
    df = schema_detect.schema_as_df(html_text.filter_langs(pages_df, ("en",)))
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"label", "relationship"}
    assert df.filter(F.col("name") == "Person").count() == 1
