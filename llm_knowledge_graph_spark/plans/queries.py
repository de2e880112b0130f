"""Read-path query surface over the materialized graph (SURVEY §2.7).

DataFrame analogues of the reference's Cypher patterns:
  Q1 schema introspection, Q2 counts, Q3/Q4 cosine top-k, Q6 neighborhood
  scan, Q7 multi-hop traversal, Q8 typed query templates, Q9 keyword
  routing. All declarative — Catalyst handles pushdown/broadcast; the
  traversal is an iterative frontier join with a visited-set anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_schema(nodes: DataFrame, edges: DataFrame, sample_n: int = 10):
    """Q1 analogue (ref get_graph_schema code/pdf_graphrag.py:304-364)."""
    return {
        "labels": nodes.select("type").distinct().orderBy("type"),
        "relationship_types": edges.select("pred").distinct().orderBy("pred"),
        # order by the FULL uniqueness key before LIMIT — (subj, pred, obj)
        # alone can tie across differing endpoint types, and TakeOrdered
        # breaks ties arbitrarily (nondeterministic samples across runs)
        "sample_nodes": nodes.orderBy("type", "id").limit(sample_n),
        "sample_edges": edges.orderBy("subj", "subj_type", "pred",
                                      "obj", "obj_type").limit(sample_n),
    }


def node_counts(nodes: DataFrame) -> DataFrame:
    """Q2 analogue (ref check_db_schema.py:23-31)."""
    return (nodes.groupBy("type").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "type"))


def edge_counts(edges: DataFrame) -> DataFrame:
    return (edges.groupBy("pred").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "pred"))


def degree_topk(edges: DataFrame, k: int = 25,
                exclude_preds=("HAS",)) -> DataFrame:
    """Top-k entities by (out+in) degree — the flagship read query.
    Chunk-side HAS edges excluded so degree reflects entity-entity links."""
    e = edges.filter(~F.col("pred").isin(list(exclude_preds)))
    endpoints = (e.select(F.col("subj").alias("id"))
                 .unionAll(e.select(F.col("obj").alias("id"))))
    return (endpoints.groupBy("id").agg(F.count("*").alias("degree"))
            .orderBy(F.desc("degree"), "id").limit(k))


def degree_topk_salted(edges: DataFrame, k: int = 25,
                       exclude_preds=("HAS",),
                       n_salts: int = 16) -> DataFrame:
    """The documented hot-graph variant of :func:`degree_topk` (round 4,
    VERDICT item 8): celebrity nodes are THE known skew of web-scale
    entity graphs — a single hub entity can carry a double-digit share
    of all endpoint rows, turning the plain groupBy's hottest reducer
    into the stage straggler. Same two-phase salt discipline as
    skew.salted_sum: phase 1 counts per (id, salt) with the salt derived
    from the OTHER endpoint (deterministic, uniform across a hub's
    edges), phase 2 sums the ≤ n_salts partials per id. Both phases are
    algebraic COUNT/SUM, so the result is bit-identical to degree_topk
    (equality is test-asserted, and the (id, _salt) exchange is
    plan-asserted)."""
    e = edges.filter(~F.col("pred").isin(list(exclude_preds)))
    endpoints = (
        e.select(F.col("subj").alias("id"), F.col("obj").alias("peer"))
        .unionAll(e.select(F.col("obj").alias("id"),
                           F.col("subj").alias("peer"))))
    salt = F.pmod(F.xxhash64("peer"), F.lit(n_salts)).alias("_salt")
    partial = (endpoints.groupBy("id", salt)
               .agg(F.count("*").alias("c")))
    return (partial.groupBy("id").agg(F.sum("c").alias("degree"))
            .orderBy(F.desc("degree"), "id").limit(k))


def neighborhood(edges: DataFrame, entity_id: str, limit: int = 50) -> DataFrame:
    """Q6 analogue: undirected 1-hop scan (ref code/pdf_graphrag.py:1041-1049:
    MATCH (n)-[r]-(m) ... LIMIT 50)."""
    out = (edges.filter(F.col("subj") == entity_id)
           .select(F.col("subj").alias("a"), F.col("pred"),
                   F.col("obj").alias("b")))
    inc = (edges.filter(F.col("obj") == entity_id)
           .select(F.col("obj").alias("a"), F.col("pred"),
                   F.col("subj").alias("b")))
    return out.unionAll(inc).orderBy("pred", "b").limit(limit)


def multi_hop(edges: DataFrame, start_id: str, depth: int = 2,
              exclude_preds=("HAS",)) -> DataFrame:
    """Q7 analogue (ref README.md:350-361 MATCH path=(e)-[*1..depth]-()):
    iterative frontier expansion with visited-set anti-join.

    Returns (id, hop) — every entity within `depth` undirected hops.
    Each iteration is one join + one anti-join; the frontier is
    localCheckpointed to keep the plan flat (same discipline as
    connected-components).
    """
    e = edges.filter(~F.col("pred").isin(list(exclude_preds)))
    sym = (e.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
           .unionAll(e.select(F.col("obj").alias("src"),
                              F.col("subj").alias("dst")))).distinct()
    spark = edges.sparkSession
    visited = spark.createDataFrame([(start_id, 0)], "id string, hop int")
    frontier = visited
    for h in range(1, depth + 1):
        nxt = (sym.join(frontier.select(F.col("id").alias("src")), "src")
               .select(F.col("dst").alias("id")).distinct()
               .join(visited.select("id"), "id", "left_anti")
               .withColumn("hop", F.lit(h))).localCheckpoint()
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited.orderBy("hop", "id")


def find_by_name_contains(nodes: DataFrame, needle: str,
                          limit: int = 25) -> DataFrame:
    """Q8 'toLower(x) CONTAINS' template (ref legal_graphrag.py:722-753;
    agent Cypher pattern code/prompts.py:100)."""
    return (nodes.filter(F.lower(F.col("id")).contains(needle.lower()))
            .select("id", "type").orderBy("id", "type").limit(limit))


QUERY_KEYWORDS = {
    "definition": ["mean", "definition", "defined"],
    "citation": ["cite", "cites", "citation", "§"],
    "obligation": ["shall", "must", "obligation"],
}


def classify_query(question: str) -> str:
    """Q9 analogue: keyword routing (ref legal_graphrag.py:705-720)."""
    q = question.lower()
    for qtype, kws in QUERY_KEYWORDS.items():
        if any(k in q for k in kws):
            return qtype
    return "general"


def question_svo(spark, question: str) -> DataFrame:
    """Q11 analogue: SVO extraction from a question string (ref find_svo
    code/pdf_graphrag.py:1330-1384, an LLM call returning
    {subject, verb, object}; deterministic variant = the E7 verb-lexicon
    matcher applied to the question). One row per matched triple —
    empty DataFrame when the question contains no lexicon verb, like the
    reference's null SVO path."""
    from ..reference_impl import extract_chunk
    raw = extract_chunk(question)
    rows = [(r["source_node_id"], r["relation"], r["target_node_id"])
            for r in raw["relationships"]]
    return spark.createDataFrame(rows,
                                 "subject string, verb string, object string")


DISCLAIMER = ("\n⚠️ **Disclaimer**: This information is extracted from legal "
              "documents. Always consult with a qualified legal professional "
              "for legal advice.")


def format_response(query: str, results: list, query_type: str = "general") -> str:
    """Q13 analogue: typed textual rendering with citations + disclaimer
    (ref _format_response legal_graphrag.py:755-783). `results` are
    collected Row dicts; driver-side string templating (bounded output —
    callers limit the result set, like the reference's LIMIT discipline)."""
    if not results:
        return "No results found in the knowledge graph for your query."
    out = "Based on the legal documents in the knowledge graph:\n\n"
    for i, result in enumerate(results, 1):
        r = dict(result.asDict()) if hasattr(result, "asDict") else dict(result)
        if query_type == "definition" and "term" in r:
            out += f"{i}. **{r['term']}**: {r.get('definition', '')}"
            if "page" in r:
                out += f" (Page {r['page']})"
            out += "\n\n"
        elif query_type == "citation" and "citation" in r:
            out += f"{i}. {r['citation']} ({r.get('type', 'N/A')})"
            if "page" in r:
                out += f" - Page {r['page']}"
            out += "\n\n"
        else:
            out += f"{i}. {r}\n\n"
    return out + DISCLAIMER
