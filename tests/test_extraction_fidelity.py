"""North-star theme 1: extraction fidelity.

* byte-identical extracted text per url (Spark UDF vs reference function)
* triple P/R vs the plain-Python oracle pipeline — must be 1.0 internally
  (the >= 0.95 target of BASELINE.json has headroom for canonicalization
  ties; we hold exact equality).
"""

import hashlib

from pyspark.sql import functions as F


def _pr(predicted: set, golden: set):
    tp = len(predicted & golden)
    precision = tp / len(predicted) if predicted else 1.0
    recall = tp / len(golden) if golden else 1.0
    return precision, recall


def test_html_to_text_byte_identity(spark, pages_df, fixture_pages):
    from llm_knowledge_graph_spark.operators.html_text import make_html_to_text_udf
    from llm_knowledge_graph_spark.reference_impl import html_to_text

    udf = make_html_to_text_udf()
    got = {
        r.url: r.t
        for r in pages_df.select("url", udf(F.col("html")).alias("t")).collect()
    }
    for p in fixture_pages:
        expected = html_to_text(p["html"])
        assert got[p["url"]] == expected, f"text drift for {p['url']}"
        # and the declared ground-truth column agrees where present
        if p["text"] is not None:
            assert expected == p["text"]


def test_text_sha256_stability(fixture_pages):
    """The extractor is a pure function: same bytes → same sha256, twice."""
    from llm_knowledge_graph_spark.reference_impl import html_to_text
    for p in fixture_pages[:20]:
        h1 = hashlib.sha256(html_to_text(p["html"]).encode()).hexdigest()
        h2 = hashlib.sha256(html_to_text(p["html"]).encode()).hexdigest()
        assert h1 == h2


def test_triple_precision_recall(kg_result, oracle_graph):
    golden = {(e["subj"], e["pred"], e["obj"]) for e in oracle_graph["edges"]}
    predicted = {(r.subj, r.pred, r.obj) for r in kg_result.edges.collect()}
    precision, recall = _pr(predicted, golden)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # internally we hold exact equality
    assert predicted == golden


def test_node_set_matches_oracle(kg_result, oracle_graph):
    golden = {(n["type"], n["id"]) for n in oracle_graph["nodes"]}
    predicted = {(r.type, r.id) for r in kg_result.nodes.collect()}
    assert predicted == golden


def test_edge_properties_and_lineage(kg_result, oracle_graph):
    """Property merge and (url, chunk_id) lineage survive the Spark path."""
    golden_props = {
        (e["subj"], e["pred"], e["obj"]): e["properties"]
        for e in oracle_graph["edges"]
    }
    for r in kg_result.edges.collect():
        assert r.url is not None and r.chunk_id is not None
        key = (r.subj, r.pred, r.obj)
        gp = golden_props.get(key)
        if gp:
            assert dict(r.properties or {}) == gp, key
