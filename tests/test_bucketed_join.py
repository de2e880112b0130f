"""Bucketed-table co-location (materialize.write_graph_bucketed_tables):
the nodes⋈edges sort-merge join must run with NO Exchange and NO Sort —
bucket k reads against bucket k — and return exactly the plain-join
result."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.mark.heavy
def test_bucketed_graph_join_has_no_exchange(spark, tmp_path):
    from llm_knowledge_graph_spark.operators.materialize import \
        write_graph_bucketed_tables
    nodes = spark.range(0, 2000).select(
        F.concat(F.lit("n"), F.col("id")).alias("id"),
        (F.col("id") % 7).alias("attr"))
    edges = spark.range(0, 10000).select(
        F.concat(F.lit("n"), (F.col("id") * 13) % 2000).alias("subj"),
        F.concat(F.lit("n"), (F.col("id") * 7) % 2000).alias("obj"))

    nt, et = write_graph_bucketed_tables(
        spark, nodes, edges, str(tmp_path), prefix="t", n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(et).join(
            spark.table(nt), F.col("subj") == F.col("id"))
            .select("subj", "obj", "attr"))
        def plan_of(df):
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()

        plan = plan_of(joined)
        # the big win: bucket k joins bucket k — the shuffle is GONE
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # with one file per bucket + the output-ordering flag, the scan
        # also exposes the sortBy order and the per-bucket Sort drops
        # (off by default since SPARK-28169: multi-file buckets would
        # interleave; our writer guarantees one file per bucket)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        try:
            plan2 = plan_of(spark.table(et).join(
                spark.table(nt), F.col("subj") == F.col("id"))
                .select("subj", "obj", "attr"))
            assert "Exchange" not in plan2, plan2
            assert "(Sort" not in plan2.replace("SortMergeJoin", "SMJ"), \
                plan2
        finally:
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering",
                "false")

        want = (edges.join(nodes, F.col("subj") == F.col("id"))
                .select("subj", "obj", "attr"))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for name in (nt, et):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
