"""E8/E9 legal NER unit tests — fixture strings lifted from the
reference's documented pattern examples (code/legal-llm/legal_graphrag.py
:112 '42 U.S.C. § 1983', :120 '123 F.3d 456', :127 '29 CFR 1910.1200',
obligations :204-210, definitions :212-219, sections :221-228)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def legal_df(spark):
    rows = [
        (0, 'The claim arises under 42 U.S.C. § 1983 and 29 CFR 1910.1200. '
            'See 123 F.3d 456. The employer shall provide notice. '
            'The employee shall not disclose records. Workers may appeal.'),
        (1, 'Under 18 u.s.c. section 371 the parties conspired. '
            'Compare 45 F.2d 12 and 7 CFR 210.'),
        (2, 'Section 4.2: Term and Termination\n'
            '"Confidential Information" means any nonpublic data. '
            'Payment of $1,250.00 is due 2026-03-15.'),
        (3, 'no legal content here at all'),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_citation_extraction(spark, legal_df):
    from llm_knowledge_graph_spark.operators.legal_ner import extract_citations
    got = {(r["doc_id"], r["ctype"], r["cite"])
           for r in extract_citations(legal_df).collect()}
    assert (0, "STATUTE", "42 U.S.C. § 1983") in got
    assert (0, "CASE_CITATION", "123 F.3d 456") in got
    assert (0, "REGULATION", "29 CFR 1910.1200") in got
    # lowercase / 'section' statute variant (ref LOWER IN ['u.s.c.','usc'])
    assert (1, "STATUTE", "18 u.s.c. section 371") in got
    assert (1, "CASE_CITATION", "45 F.2d 12") in got
    assert (1, "REGULATION", "7 CFR 210") in got
    assert not any(d == 3 for d, _, _ in got)


def test_obligation_classification(spark, legal_df):
    from llm_knowledge_graph_spark.operators.legal_ner import obligation_counts
    rows = {r["doc_id"]: r for r in obligation_counts(legal_df).collect()}
    # doc 0: 'shall provide' obligation, 'shall not disclose' prohibition,
    # 'may appeal' permission
    assert rows[0]["n_obligation"] == 1
    assert rows[0]["n_prohibition"] == 1
    assert rows[0]["n_permission"] == 1
    assert rows[3]["n_obligation"] == 0
    assert rows[3]["n_prohibition"] == 0


def test_definition_and_section_extraction(spark, legal_df):
    from llm_knowledge_graph_spark.operators.legal_ner import (
        extract_definitions, extract_sections)
    defs = extract_definitions(legal_df).collect()
    assert len(defs) == 1
    assert defs[0]["term"] == "Confidential Information"
    assert defs[0]["definition"] == "any nonpublic data."
    secs = {r["doc_id"]: r for r in extract_sections(legal_df).collect()}
    assert secs[2]["sec_number"] == "4.2"
    assert secs[2]["sec_title"] == "Term and Termination"
    # faithful reference quirk: the section pattern also fires on the
    # '§ 1983' inside doc 0's statute citation (the reference's regex
    # ref :222 behaves identically on this text)
    assert secs[0]["sec_number"] == "1983"


def test_dates_and_amounts(spark, legal_df):
    from llm_knowledge_graph_spark.operators.legal_ner import (
        extract_dates_amounts)
    rows = {r["doc_id"]: r for r in extract_dates_amounts(legal_df).collect()}
    assert rows[2]["eff_date"] == "2026-03-15"
    assert rows[2]["amount"] == "$1,250.00"
    assert rows[3]["eff_date"] == "" and rows[3]["amount"] == ""


def test_party_extraction(spark):
    """E9 parties (round 3): 'between X and Y' recital + designation
    clauses (deterministic stand-in for ref :189-197 spaCy PERSON/ORG)."""
    from llm_knowledge_graph_spark.operators.legal_ner import extract_parties
    df = spark.createDataFrame([
        (0, "This agreement is between Acme Corp and Stark Industries. "
            "Vendor: Hooli Inc."),
        (1, "Party: Jane Smith shall sign. Client: Initech Ltd agrees."),
        (2, "nothing between us and them here"),  # lowercase → no match
    ], "doc_id long, text string")
    got = {(r["doc_id"], r["role"], r["party"])
           for r in extract_parties(df).collect()}
    assert (0, "PARTY_A", "Acme Corp") in got
    assert (0, "PARTY_B", "Stark Industries") in got
    assert (0, "NAMED", "Hooli Inc") in got
    assert (1, "NAMED", "Jane Smith") in got
    assert not any(d == 2 for d, _, _ in got)
