"""Unit tests for N1-N4 normalization — bit-exact Python string semantics
(ref code/pdf_graphrag.py:30-60, 437-439), including the .title() /
.capitalize() edge cases where Spark's initcap would differ."""

from llm_knowledge_graph_spark.reference_impl import (
    format_node_type,
    format_property_key,
    format_relationship_type,
    normalize_node_id,
)


def test_property_key_camelcase():
    assert format_property_key("first name") == "firstName"
    assert format_property_key("since year") == "sinceYear"
    assert format_property_key("name") == "name"
    assert format_property_key("") == ""
    assert format_property_key("A B C") == "aBC"
    # .capitalize() lowercases the tail — unlike initcap
    assert format_property_key("x YEAR value") == "xYearValue"


def test_node_type_capitalize():
    assert format_node_type("person") == "Person"
    assert format_node_type(" organization ") == "Organization"
    assert format_node_type("") == "Entity"
    assert format_node_type(None) == "Entity"
    assert format_node_type("   ") == "Entity"
    # Python .capitalize() lowercases everything after the first char
    assert format_node_type("LEGAL CONCEPT") == "Legal concept"


def test_relationship_type_upper_snake():
    assert format_relationship_type("works for") == "WORKS_FOR"
    assert format_relationship_type("shall not disclose to") == "SHALL_NOT_DISCLOSE_TO"
    assert format_relationship_type("") == "RELATED_TO"
    assert format_relationship_type(None) == "RELATED_TO"
    assert format_relationship_type(" cites ") == "CITES"


def test_node_id_title_case():
    assert normalize_node_id(" john doe ") == "John Doe"
    # digit-leading ids are NOT title-cased (ref :438)
    assert normalize_node_id("42 usc 1983") == "42 usc 1983"
    # Python .title() quirk on apostrophes (initcap would differ)
    assert normalize_node_id("o'brien") == "O'Brien"
    assert normalize_node_id("§ 12") == "§ 12"
