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
