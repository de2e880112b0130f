"""K3/S4: the JSON golden artifact — graph-document sink + read-back.

The reference serializes every per-chunk GraphDocument to one JSON file
(`GRAPH_DOCS.json`, written at ref code/pdf_graphrag.py:839-841 via
graph_document_to_json :63-97) and its test flows read it back (S4).
Engine equivalent: the graph-doc grouping is just `groupBy(url, chunk_id)`
over the nodes/edges tables (SURVEY §1.1: GraphDocument is not
materialized state, only a grouping), so

  * the K3 sink re-groups both tables into
    {url, chunk_id, nodes: [...], relationships: [...]} rows and
    `write.json`s them — arrays sorted for a deterministic golden artifact;
  * the S4 source `read.json`s with the EXPLICIT schema (never inferred —
    schema inference re-scans the data and types empty maps wrong) and
    explodes back to the flat nodes/edges shape.

Roundtrip equality is asserted in tests/test_golden_json.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NODE = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])
_REL = T.StructType([
    T.StructField("subj", T.StringType()),
    T.StructField("subj_type", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("obj_type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])
GRAPH_DOC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("chunk_id", T.LongType()),
    T.StructField("nodes", T.ArrayType(_NODE)),
    T.StructField("relationships", T.ArrayType(_REL)),
])


def graph_docs(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-chunk grouping of nodes + relationships — the GraphDocument rows
    (ref GraphDocument(nodes, relationships, source) :496-500). Arrays are
    sorted (struct-field order) so the artifact is byte-deterministic."""
    # structs carry a map column, which Spark cannot order — array_sort
    # with an explicit key comparator (unit separator never appears in
    # normalized ids/types) keeps the artifact deterministic
    def by_key(key_fn):
        def cmp(a, b):
            ka, kb = key_fn(a), key_fn(b)
            return F.when(ka < kb, F.lit(-1)).when(ka > kb, F.lit(1)) \
                    .otherwise(F.lit(0))
        return cmp

    n = (nodes.groupBy("url", "chunk_id")
         .agg(F.array_sort(
             F.collect_list(F.struct("id", "type", "properties")),
             by_key(lambda s: F.concat_ws("\x1f", s["id"], s["type"]))
         ).alias("nodes")))
    e = (edges.groupBy("url", "chunk_id")
         .agg(F.array_sort(
             F.collect_list(F.struct("subj", "subj_type", "pred", "obj",
                                     "obj_type", "properties")),
             by_key(lambda s: F.concat_ws(
                 "\x1f", s["subj"], s["pred"], s["obj"],
                 s["subj_type"], s["obj_type"]))
         ).alias("relationships")))
    empty_n = F.array().cast(T.ArrayType(_NODE))
    empty_r = F.array().cast(T.ArrayType(_REL))
    return (n.join(e, ["url", "chunk_id"], "full")
            .select("url", "chunk_id",
                    F.coalesce("nodes", empty_n).alias("nodes"),
                    F.coalesce("relationships", empty_r)
                    .alias("relationships")))


def write_graph_docs_json(nodes: DataFrame, edges: DataFrame,
                          path: str) -> None:
    """K3: the golden JSON artifact (ref json.dump → GRAPH_DOCS.json
    :839-841); line-delimited JSON, one graph-doc per line."""
    graph_docs(nodes, edges).write.mode("overwrite").json(path)


def read_graph_docs_json(spark: SparkSession, path: str) -> DataFrame:
    """S4: golden-JSON source with explicit schema (ref json.load
    read-back; SURVEY §2.1 S4)."""
    return spark.read.schema(GRAPH_DOC_SCHEMA).json(path)


# ---------------------------------------------------------------------
# Reference-artifact compatibility reader (round 4): the reference's OWN
# GRAPH_DOCS.json (written by graph_document_to_json, ref
# code/pdf_graphrag.py:63-97, dumped at :839-841) differs from the
# engine's golden sink in three ways — it is ONE multiline JSON array
# (not line-delimited), its relationship fields are named
# source_id/source_type/relation/target_id/target_type, and node
# property VALUES are heterogeneous (strings, the int page number, and
# the 3072-float chunk embedding list). Reading property values as
# StringType is the lossless trick: Spark's JSON parser re-serializes
# any non-string value back to its JSON text, so the embedding survives
# as a parseable "[-0.01, ...]" string (recovered with from_json below).
_REF_REL = T.StructType([
    T.StructField("source_id", T.StringType()),
    T.StructField("source_type", T.StringType()),
    T.StructField("relation", T.StringType()),
    T.StructField("target_id", T.StringType()),
    T.StructField("target_type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])
REF_GRAPH_DOC_SCHEMA = T.StructType([
    T.StructField("nodes", T.ArrayType(_NODE)),
    T.StructField("relationships", T.ArrayType(_REF_REL)),
    T.StructField("source", T.StringType()),
])


def read_reference_graph_docs(spark: SparkSession, path: str) -> DataFrame:
    """S4 against the reference's real artifact: one row per
    GraphDocument with (doc_id, nodes, relationships, source). doc_id is
    the array position (the reference writes docs in chunk order — the
    per-doc Chunk node ids are chunk_0..chunk_14 in GRAPH_DOCS.json),
    recovered deterministically from each doc's own Chunk node."""
    gd = (spark.read.schema(REF_GRAPH_DOC_SCHEMA)
          .option("multiLine", "true").json(path))
    # try_element_at, not element_at: under Spark 4 ANSI mode a doc
    # without a Chunk node would throw on the empty filtered array.
    # nullif(.., ''), not coalesce: regexp_extract returns '' (NOT null)
    # for a Chunk id that doesn't match chunk_(\d+), and ''.cast('long')
    # throws under ANSI mode — nullif maps the no-match case to a real
    # null doc_id (round-5 ADVICE fix; the previous coalesce-with-null
    # fallback was identity and only worked because every Chunk id in
    # the pinned artifact matches).
    chunk_id = F.try_element_at(
        F.filter("nodes", lambda n: n["type"] == F.lit("Chunk")), F.lit(1)
    )["id"]
    return gd.select(
        F.nullif(F.regexp_extract(chunk_id, r"chunk_(\d+)", 1),
                 F.lit("")).cast("long").alias("doc_id"),
        "nodes", "relationships", "source")


def reference_graph_docs_to_tables(gd: DataFrame):
    """Project the reference artifact onto the engine's flat nodes/edges
    contract (url := 'golden://<doc_id>', chunk_id := doc_id; field
    renames relation→pred etc.). Returns (nodes, edges)."""
    url = F.concat(F.lit("golden://"), F.col("doc_id")).alias("url")
    nodes = (gd.select("doc_id", F.explode("nodes").alias("n"))
             .select(F.col("n.id").alias("id"),
                     F.col("n.type").alias("type"),
                     F.col("n.properties").alias("properties"),
                     url, F.col("doc_id").alias("chunk_id")))
    edges = (gd.select("doc_id", F.explode("relationships").alias("e"))
             .select(F.col("e.source_id").alias("subj"),
                     F.col("e.source_type").alias("subj_type"),
                     F.col("e.relation").alias("pred"),
                     F.col("e.target_id").alias("obj"),
                     F.col("e.target_type").alias("obj_type"),
                     F.col("e.properties").alias("properties"),
                     url, F.col("doc_id").alias("chunk_id")))
    return nodes, edges


# ---------------------------------------------------------------------
# Second reference artifact (round 5): graph_docs_debug.json is the
# OTHER serialization the reference emits — LLMGraphTransformer graph
# docs dumped via model_dump() (ref code/romeo-juliet/test_single_query
# .py:27-28): relationships carry NESTED source/target node structs
# (not flat source_id/source_type fields), and `source` is a LangChain
# Document object (metadata.page is the natural doc key; every one of
# the 123 page-docs has a distinct page), not a text string.
_DBG_REL = T.StructType([
    T.StructField("source", _NODE),
    T.StructField("target", _NODE),
    T.StructField("type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])
_DBG_SOURCE = T.StructType([
    T.StructField("metadata", T.StructType([
        T.StructField("page", T.LongType()),
        T.StructField("total_pages", T.LongType()),
        T.StructField("source", T.StringType()),
    ])),
    T.StructField("page_content", T.StringType()),
])
DBG_GRAPH_DOC_SCHEMA = T.StructType([
    T.StructField("nodes", T.ArrayType(_NODE)),
    T.StructField("relationships", T.ArrayType(_DBG_REL)),
    T.StructField("source", _DBG_SOURCE),
])


def read_reference_debug_graph_docs(spark: SparkSession,
                                    path: str) -> DataFrame:
    """S4 against the reference's second real artifact
    (graph_docs_debug.json, Romeo & Juliet): one row per LLMGraph-
    Transformer GraphDocument with (doc_id := source page, nodes,
    relationships, source_text)."""
    gd = (spark.read.schema(DBG_GRAPH_DOC_SCHEMA)
          .option("multiLine", "true").json(path))
    return gd.select(
        F.col("source.metadata.page").alias("doc_id"),
        "nodes", "relationships",
        F.col("source.page_content").alias("source_text"))


def reference_debug_graph_docs_to_tables(gd: DataFrame):
    """Project the debug artifact onto the engine's flat nodes/edges
    contract (same columns reference_graph_docs_to_tables emits, so the
    merge/linking/query operators consume either artifact unchanged)."""
    url = F.concat(F.lit("golden-debug://"), F.col("doc_id")).alias("url")
    nodes = (gd.select("doc_id", F.explode("nodes").alias("n"))
             .select(F.col("n.id").alias("id"),
                     F.col("n.type").alias("type"),
                     F.col("n.properties").alias("properties"),
                     url, F.col("doc_id").alias("chunk_id")))
    edges = (gd.select("doc_id", F.explode("relationships").alias("e"))
             .select(F.col("e.source.id").alias("subj"),
                     F.col("e.source.type").alias("subj_type"),
                     F.col("e.type").alias("pred"),
                     F.col("e.target.id").alias("obj"),
                     F.col("e.target.type").alias("obj_type"),
                     F.col("e.properties").alias("properties"),
                     url, F.col("doc_id").alias("chunk_id")))
    return nodes, edges


def reference_chunk_embeddings(nodes: DataFrame) -> DataFrame:
    """Recover the typed 3072-float chunk embeddings from the stringified
    property map — the same (url, chunk_id, embedding array<float>) shape
    as operators/embed.py's chunk-embedding table (C4/K4)."""
    return (nodes.filter(F.col("type") == "Chunk")
            .select("url", "chunk_id",
                    F.from_json(F.col("properties")["embedding"],
                                T.ArrayType(T.FloatType()))
                    .alias("embedding")))


def nodes_from_graph_docs(gd: DataFrame) -> DataFrame:
    return (gd.select("url", "chunk_id", F.explode("nodes").alias("n"))
            .select(F.col("n.id").alias("id"), F.col("n.type").alias("type"),
                    F.col("n.properties").alias("properties"),
                    "url", "chunk_id"))


def edges_from_graph_docs(gd: DataFrame) -> DataFrame:
    return (gd.select("url", "chunk_id", F.explode("relationships").alias("e"))
            .select(F.col("e.subj").alias("subj"),
                    F.col("e.subj_type").alias("subj_type"),
                    F.col("e.pred").alias("pred"),
                    F.col("e.obj").alias("obj"),
                    F.col("e.obj_type").alias("obj_type"),
                    F.col("e.properties").alias("properties"),
                    "url", "chunk_id"))
