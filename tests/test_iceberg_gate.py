"""The gated Iceberg adapter (sources/iceberg.py).

This container has no iceberg-spark-runtime jar, so the tests pin the
FALLBACK contract: reads land on parquet with the input_hint schema and
byte-identical rows, writes fail fast with the documented error naming
the layout-identical parquet sink. The real-Iceberg branch is exercised
only when a runtime jar is present (skipif)."""

from __future__ import annotations

import pytest

from llm_knowledge_graph_spark.sources.iceberg import (
    IcebergUnavailableError, iceberg_available, read_pages_table,
    write_graph_iceberg)
from llm_knowledge_graph_spark.sources.pages import (PAGES_SCHEMA,
                                                     synthesize_pages)


def test_runtime_probe_is_false_here(spark):
    assert iceberg_available(spark) is False


def test_read_falls_back_to_parquet_identically(spark, tmp_path):
    pages = synthesize_pages(spark, 24, seed=7)
    path = str(tmp_path / "pages")
    pages.write.parquet(path)
    got = read_pages_table(spark, path)
    # file sources force nullable=True on the supplied schema, so the
    # contract is names + types, not nullability flags
    assert [(f.name, f.dataType) for f in got.schema.fields] \
        == [(f.name, f.dataType) for f in PAGES_SCHEMA.fields]
    want = {r.url: r.text for r in pages.collect()}
    have = {r.url: r.text for r in got.collect()}
    assert have == want


def test_write_raises_documented_gate(spark):
    df = spark.createDataFrame(
        [("a", "R", "b")], "subj string, pred string, obj string")
    nodes = spark.createDataFrame([("a", "T")], "id string, type string")
    with pytest.raises(IcebergUnavailableError, match="write_graph"):
        write_graph_iceberg(nodes, df, "cat.kg")


def test_real_iceberg_roundtrip(spark, tmp_path):  # pragma: no cover
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar in this container")
    nodes = spark.createDataFrame([("a", "T")], "id string, type string")
    edges = spark.createDataFrame(
        [("a", "R", "b")], "subj string, pred string, obj string")
    write_graph_iceberg(nodes, edges, "local.kg", n_buckets=4, salt=2)
    assert spark.table("local.kg.edges").count() == 1
