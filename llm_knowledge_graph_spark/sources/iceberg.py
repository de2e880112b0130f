"""Gated Iceberg table adapter (north rule: Iceberg in, Iceberg out).

The north rule reads Common-Crawl-style pages from an Iceberg table and
materializes the nodes/edges tables as Iceberg partitioned by subject
hash. This container ships no iceberg-spark-runtime jar (and installs
are off-limits), so every Iceberg path here is gated on a JVM probe:

* runtime present  → real ``format("iceberg")`` reads and
  DataFrameWriterV2 writes using Iceberg's native ``bucket(N, col)``
  partition transform — which IS the subject-hash partitioning the
  manual ``pmod(xxhash64(subj), N)`` column in
  :mod:`..operators.materialize` emulates (Iceberg's bucket transform
  is a Murmur3 hash mod N; the pruning contract — a per-subject read
  touches exactly one bucket — is identical).
* runtime absent   → reads fall back to parquet with the same schema;
  writes raise a documented :class:`IcebergUnavailableError` directing
  callers to :func:`..operators.materialize.write_graph`, the
  layout-identical parquet sink every test and driver query uses.

Cluster DDL this adapter targets (executed by Iceberg on
``createOrReplace``)::

    CREATE TABLE <cat>.kg.edges (subj string, pred string, obj string,
        properties map<string,string>, lineage array<string>)
    USING iceberg PARTITIONED BY (bucket(256, subj));
    CREATE TABLE <cat>.kg.nodes (id string, type string, ...)
    USING iceberg PARTITIONED BY (bucket(256, id));

Resumability mapping: the per-partition checkpoint protocol in
:mod:`..operators.checkpoint` (manifest + torn-write repair) maps to
Iceberg's write-audit-publish — each completed bucket becomes an
appended snapshot on a staging branch, and "publish" is a fast-forward
of ``main``; crash replay is then snapshot-idempotent instead of
directory-idempotent. The incremental-merge deltas of
:mod:`..streaming.ingest` likewise become per-batch appends whose
compaction is Iceberg ``rewrite_data_files``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import PAGES_SCHEMA

_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


class IcebergUnavailableError(RuntimeError):
    """Raised by write paths when no iceberg-spark-runtime jar is loaded."""


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_EXT)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_pages_table(spark: SparkSession, ref: str) -> DataFrame:
    """Scan the pages table: Iceberg when the runtime is present and
    ``ref`` is a catalog table name, else the parquet dataset at ``ref``
    with the input_hint schema. Either way Catalyst pushes lang filters
    and column pruning into the scan (Iceberg additionally prunes on
    partition stats and data-file min/max)."""
    if iceberg_available(spark) and "/" not in ref:
        return spark.read.format("iceberg").load(ref)
    return spark.read.schema(PAGES_SCHEMA).parquet(ref)


def write_graph_iceberg(nodes: DataFrame, edges: DataFrame,
                        table_prefix: str, n_buckets: int = 256,
                        salt: int = 8) -> None:
    """Materialize the graph as Iceberg tables partitioned by Iceberg's
    native bucket transform on the subject / node id, with the same
    salted pre-shuffle as the parquet sink so hot subjects fan over
    ``salt`` reducers. Raises :class:`IcebergUnavailableError` in
    runtimes without the Iceberg jar — use
    ``operators.materialize.write_graph`` (identical layout) there."""
    spark = nodes.sparkSession
    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            "iceberg-spark-runtime is not on the classpath; use "
            "operators.materialize.write_graph(...) — the "
            "subject-hash-bucketed parquet sink with the same layout.")
    salted = F.pmod(F.xxhash64(F.col("subj"), F.col("obj")), F.lit(salt))
    (edges.repartition(n_buckets * salt,
                       F.pmod(F.xxhash64("subj"), F.lit(n_buckets)), salted)
     .writeTo(f"{table_prefix}.edges")
     .partitionedBy(F.bucket(n_buckets, F.col("subj")))
     .createOrReplace())
    (nodes.repartition(n_buckets, F.pmod(F.xxhash64("id"), F.lit(n_buckets)))
     .writeTo(f"{table_prefix}.nodes")
     .partitionedBy(F.bucket(n_buckets, F.col("id")))
     .createOrReplace())
