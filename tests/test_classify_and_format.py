"""E11 keyword classifier + Q13 result formatter."""

from __future__ import annotations

import pytest


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


@pytest.mark.heavy
def test_reference_taxonomy_classifier(spark):
    """E11 with the reference's REAL taxonomies (TYP_PREDPISU.md legislation
    types, CLENENIE_PRAVA.md legal areas; response shape code/prompts.py
    :140-166): both dimensions classified, multi-word precedence holds
    ('Ústavný zákon' must not fall through to 'Zákon'), default is the
    taxonomy's own '(Ostatné)' bucket."""
    from llm_knowledge_graph_spark.operators.classify import (
        classify_reference_taxonomy)
    df = spark.createDataFrame([
        (0, "Zákon č. 595/2003 Z. z. o dani z príjmov upravuje dane."),
        (1, "Ústavný zákon č. 460/1992 Zb. Ústava Slovenskej republiky."),
        (2, "Vyhláška ministerstva o trestnom konaní."),
        (3, "completely unrelated english text"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["type_legislation"], r["type_category"],
                         r["leg_confidence"], r["cat_confidence"])
           for r in classify_reference_taxonomy(df).collect()}
    assert got[0][0] == "Zákon" and got[0][1] == "Finančné právo"
    assert got[0][2] >= 1 and got[0][3] >= 1
    assert got[1][0] == "Ústavný zákon"      # precedence over 'zákon'
    assert got[1][1] == "Ústavné právo"      # 'ústavn' area marker
    assert got[2][0] == "Vyhláška" and got[2][1] == "Trestné právo"
    assert got[3] == ("(Ostatné)", "(Ostatné)", 0, 0)
