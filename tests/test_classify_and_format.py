"""E11 keyword classifier + Q13 result formatter."""

from __future__ import annotations


def test_keyword_classifier_precedence_and_confidence(spark):
    from llm_knowledge_graph_spark.operators.classify import keyword_classify
    df = spark.createDataFrame(
        [(0, "the stream joins the window"),     # stream wins (precedence)
         (1, "join join join"),                  # 3 occurrences
         (2, "nothing relevant"),
         (3, "vector vector")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in keyword_classify(df).collect()}
    assert rows[0]["doc_type"] == "Streaming" and rows[0]["confidence"] == 1
    assert rows[1]["doc_type"] == "Relational" and rows[1]["confidence"] == 3
    assert rows[2]["doc_type"] == "General" and rows[2]["confidence"] == 0
    assert rows[3]["doc_type"] == "VectorSearch" and rows[3]["confidence"] == 2


def test_format_response_shapes(spark):
    """Mirrors _format_response (ref legal_graphrag.py:755-783): typed
    rendering, numbering, page citations, disclaimer, empty-result text."""
    from llm_knowledge_graph_spark.plans.queries import (DISCLAIMER,
                                                         format_response)
    assert format_response("q", [], "definition") == \
        "No results found in the knowledge graph for your query."
    out = format_response(
        "what does Agreement mean",
        [{"term": "Agreement", "definition": "the contract.", "page": 3}],
        "definition")
    assert "1. **Agreement**: the contract. (Page 3)" in out
    assert out.endswith(DISCLAIMER)
    out2 = format_response(
        "cite", [{"citation": "42 U.S.C. § 1983", "type": "STATUTE"}],
        "citation")
    assert "1. 42 U.S.C. § 1983 (STATUTE)" in out2
    # general fallback renders the raw dict, numbered
    out3 = format_response("anything", [{"id": "X"}], "general")
    assert out3.startswith("Based on the legal documents")
    assert "1. {'id': 'X'}" in out3
