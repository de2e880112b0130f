"""Graph materialization (K1/K2 analogue): nodes/edges tables replace Neo4j.

The reference writes one MERGE round-trip per node/edge over Bolt
(ref code/pdf_graphrag.py:272-300); here the graph lands as columnar tables:

  * `edges` partitioned by `subj_bucket = pmod(xxhash64(subj), N)` —
    subject-hash partitioning (north rule) so per-subject reads prune to one
    bucket, with an extra salt column in the shuffle so hot subjects
    ("celebrity entities") spread over `salt` reducers instead of one.
  * `nodes` partitioned by the same bucket of `canonical_id`.
  * a `metrics` table with per-type node counts / per-pred edge counts +
    totals (V6 analogue, ref code/legal-llm/legal_graphrag.py:642-679) —
    the triple-count metrics of the north rule.

On a cluster these become Iceberg tables (`write.format("iceberg")`); the
sandbox writes parquet with identical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_subject_bucket(df: DataFrame, col: str, n_buckets: int) -> DataFrame:
    return df.withColumn("subj_bucket", F.pmod(F.xxhash64(F.col(col)),
                                               F.lit(n_buckets)).cast("int"))


def write_graph(nodes: DataFrame, edges: DataFrame, out_dir: str,
                n_buckets: int = 32, salt: int = 8,
                fmt: str = "parquet") -> None:
    """Writes {out_dir}/nodes, {out_dir}/edges, {out_dir}/metrics."""
    nodes_b = with_subject_bucket(nodes, "id", n_buckets)
    edges_b = with_subject_bucket(edges, "subj", n_buckets)

    # Salted repartition: shuffle key = (bucket, salt) so a hot subject's
    # rows land on `salt` tasks; files still collapse under bucket=K dirs.
    salted = F.pmod(F.xxhash64(F.col("subj"), F.col("obj")), F.lit(salt))
    (edges_b
     .repartition(n_buckets * salt, F.col("subj_bucket"), salted)
     .write.mode("overwrite").partitionBy("subj_bucket")
     .format(fmt).save(f"{out_dir}/edges"))

    (nodes_b
     .repartition(n_buckets, F.col("subj_bucket"))
     .write.mode("overwrite").partitionBy("subj_bucket")
     .format(fmt).save(f"{out_dir}/nodes"))

    metrics = graph_metrics(nodes, edges)
    metrics.coalesce(1).write.mode("overwrite").format(fmt).save(f"{out_dir}/metrics")


def graph_metrics(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(kind, key, n): node counts per type, edge counts per pred, totals."""
    per_type = nodes.groupBy(F.col("type").alias("key")).agg(
        F.count("*").alias("n")).withColumn("kind", F.lit("nodes_by_type"))
    per_pred = edges.groupBy(F.col("pred").alias("key")).agg(
        F.count("*").alias("n")).withColumn("kind", F.lit("edges_by_pred"))
    node_total = nodes.agg(F.count("*").alias("n")).select(
        F.lit("nodes").alias("key"), "n", F.lit("total").alias("kind"))
    edge_total = edges.agg(F.count("*").alias("n")).select(
        F.lit("edges").alias("key"), "n", F.lit("total").alias("kind"))
    return (per_type.unionByName(per_pred)
            .unionByName(node_total).unionByName(edge_total)
            .select("kind", "key", "n"))


def read_graph(spark: SparkSession, out_dir: str, fmt: str = "parquet"):
    nodes = spark.read.format(fmt).load(f"{out_dir}/nodes")
    edges = spark.read.format(fmt).load(f"{out_dir}/edges")
    return nodes, edges
