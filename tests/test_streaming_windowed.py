"""Watermarked windowed agg + applyInPandasWithState stateful dedup:
drained-stream vs batch equality, and cross-batch first-seen semantics."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.heavy  # round-5 core/heavy split

from pyspark.sql import functions as F


def _drain(q, timeout=120):
    finished = q.awaitTermination(timeout)
    if not finished:
        q.stop()
        raise TimeoutError("stream did not drain")


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from llm_knowledge_graph_spark.streaming.windowed import (
        batch_windowed_event_counts, windowed_event_counts)
    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)
    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet("/root/testdata/sf0.001"))
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    _drain(q)
    got = {(r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
           for r in spark.table("win_counts").collect()}
    want = {(r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
            for r in batch_windowed_event_counts(batch, "1 hour").collect()}
    assert got == want and len(want) > 5


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Duplicates split ACROSS two files/batches: the second occurrence
    must be suppressed by state carried between micro-batches — the
    property a per-batch dropDuplicates cannot provide."""
    import os
    src_dir = str(tmp_path / "docs_stream")
    os.makedirs(src_dir, exist_ok=True)
    batch1 = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")],
        "doc_id long, text string")
    batch2 = spark.createDataFrame(
        [(3, "alpha text"), (4, "gamma text"), (5, "beta text")],
        "doc_id long, text string")
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/f1")
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/f2")

    from llm_knowledge_graph_spark.streaming.windowed import (
        streaming_first_seen)
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src_dir}/*"))
    out = streaming_first_seen(stream)
    q = (out.writeStream.format("memory").queryName("first_seen")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    _drain(q)
    rows = spark.table("first_seen").collect()
    by_digest: dict = {}
    for r in rows:
        by_digest.setdefault(r["digest"], []).append(r["doc_id"])
    # exactly one emission per distinct text, and it is the FIRST doc_id
    assert all(len(v) == 1 for v in by_digest.values()), by_digest
    emitted_ids = sorted(r["doc_id"] for r in rows)
    assert emitted_ids == [0, 1, 4]  # 2, 3 (dups of 0) and 5 (dup of 1) suppressed


def test_merge_first_seen_delta_append():
    """Round-3 state-churn bound: the packed-binary state blob grows by
    EXACTLY 16 bytes per new digest and the existing prefix is
    byte-identical (append-only — no per-batch re-sort/rewrite of prior
    state), duplicates emit nothing, min doc_id wins within a batch."""
    import hashlib

    from llm_knowledge_graph_spark.streaming.windowed import merge_first_seen

    def dg(s):
        return hashlib.md5(s.encode()).hexdigest()

    blob1, out1 = merge_first_seen(b"", [(5, dg("a")), (1, dg("b")),
                                         (3, dg("a"))])
    # min doc_id wins per digest, emission ordered by doc_id
    assert out1 == [(1, dg("b")), (3, dg("a"))]
    assert len(blob1) == 32
    # batch 2: one dup (no growth from it), one new digest
    blob2, out2 = merge_first_seen(blob1, [(7, dg("b")), (9, dg("c"))])
    assert out2 == [(9, dg("c"))]
    assert len(blob2) == len(blob1) + 16          # delta-append growth only
    assert blob2[:len(blob1)] == blob1            # prior state untouched
    # batch 3: all dups → blob unchanged (caller skips state.update)
    blob3, out3 = merge_first_seen(blob2, [(11, dg("a")), (12, dg("c"))])
    assert out3 == [] and blob3 == blob2


def test_streaming_first_seen_wider_prefix(spark, tmp_path):
    """The prefix_len sizing knob: prefix_len=3 (4096 shards) must preserve
    cross-batch suppression semantics, and first_seen_prefix_len encodes
    the documented sizing rule."""
    import os

    from llm_knowledge_graph_spark.streaming.windowed import (
        first_seen_prefix_len, streaming_first_seen)
    assert first_seen_prefix_len(10**6) == 1
    assert first_seen_prefix_len(10**9) == 4
    assert first_seen_prefix_len(10**12) == 6

    src_dir = str(tmp_path / "docs_stream3")
    os.makedirs(src_dir, exist_ok=True)
    spark.createDataFrame([(0, "alpha"), (1, "beta")],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{src_dir}/f1")
    spark.createDataFrame([(2, "alpha"), (3, "gamma")],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{src_dir}/f2")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(f"{src_dir}/*"))
    out = streaming_first_seen(stream, prefix_len=3)
    q = (out.writeStream.format("memory").queryName("first_seen3")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt3"))
         .trigger(availableNow=True).start())
    _drain(q)
    rows = spark.table("first_seen3").collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 3]
    assert all(len(r["key"]) == 3 for r in rows)


def test_streaming_hll_equals_batch(spark):
    """Distinct-token sketch over a stream: the drained register state
    finishes to the IDENTICAL estimate as the one-shot batch sketch
    (register max-merge across micro-batches is lossless)."""
    from llm_knowledge_graph_spark.operators.sketches import (
        hll_distinct, hll_estimate)
    from llm_knowledge_graph_spark.streaming.windowed import \
        streaming_hll_registers
    src_dir = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{src_dir}/documents.parquet")
    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir))

    def words(df):
        return df.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("w"))

    regs = streaming_hll_registers(words(stream), "lang", "w")
    q = (regs.writeStream.format("memory").queryName("hll_regs")
         .outputMode("complete").trigger(availableNow=True).start())
    _drain(q)
    got = {r.lang: r.n_hll for r in
           hll_estimate(spark.table("hll_regs"), "lang").collect()}
    want = {r.lang: r.n_hll for r in
            hll_distinct(words(batch), "lang", "w").collect()}
    assert got == want and len(want) >= 2


def test_streaming_cms_equals_batch(spark):
    """Heavy-hitter grid over a stream: drained counter state yields
    IDENTICAL point estimates to the batch grid (elementwise-sum merge
    across micro-batches is lossless)."""
    from llm_knowledge_graph_spark.operators.sketches import (
        cms_counters, cms_estimate)
    from llm_knowledge_graph_spark.streaming.windowed import \
        streaming_cms_counters
    src_dir = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{src_dir}/documents.parquet")
    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir))

    def weighted_tokens(df):
        return (df.select(F.explode(F.split(F.col("text"), " "))
                          .alias("w"))
                .withColumn("cnt", F.lit(1).cast("long")))

    grid = streaming_cms_counters(weighted_tokens(stream), "w", "cnt")
    q = (grid.writeStream.format("memory").queryName("cms_grid")
         .outputMode("complete").trigger(availableNow=True).start())
    _drain(q)

    counts = (weighted_tokens(batch).groupBy("w")
              .agg(F.sum("cnt").alias("cnt")))
    probes = counts.orderBy(F.desc("cnt"), "w").limit(20)
    got = {r.w: r.cms_est for r in
           cms_estimate(probes, spark.table("cms_grid"), "w").collect()}
    want = {r.w: r.cms_est for r in
            cms_estimate(probes, cms_counters(counts, "w", "cnt"),
                         "w").collect()}
    assert got == want and len(want) == 20


def test_stream_static_enriched_equals_batch(spark):
    """Stream-static broadcast join: drained complete-mode per-tier
    rollup equals the batch join+agg twin, and the static dim side is
    physically broadcast (no shuffle of the stream for the join)."""
    from llm_knowledge_graph_spark.streaming.windowed import (
        batch_stream_static_enriched_counts, stream_static_enriched_counts,
        user_tier_dim)
    src_dir = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{src_dir}/events.parquet")
    dim = user_tier_dim(batch)

    twin = batch_stream_static_enriched_counts(batch, dim)
    plan = twin._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    stream = (spark.readStream.schema(batch.schema)
              .option("pathGlobFilter", "events.parquet").parquet(src_dir))
    agg = stream_static_enriched_counts(stream, dim)
    q = (agg.writeStream.format("memory").queryName("enriched_test")
         .outputMode("complete").trigger(availableNow=True).start())
    _drain(q)
    got = {r["tier"]: (r["n_events"], r["value_cents"], r["points"])
           for r in spark.table("enriched_test").collect()}
    want = {r["tier"]: (r["n_events"], r["value_cents"], r["points"])
            for r in twin.collect()}
    assert got == want and len(want) == 4
    # points really are mult-weighted: strictly more than cents for any
    # tier with mult > 1
    for tier in ("silver", "gold", "vip"):
        assert got[tier][2] > got[tier][1]


def _write_event_files(spark, src_dir, *file_rows):
    import os
    import time

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(file_rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{src_dir}/f{i}")
        time.sleep(1.1)   # distinct mtimes → deterministic batch order
    return schema


def test_windowed_append_watermark_contract(spark, tmp_path):
    """Pin Spark's ACTUAL late-data guarantee for watermarked windowed
    aggregation in append mode (the one-sided contract a late-data
    pipeline must design around, verified against observed
    numRowsDroppedByWatermark):

    1. a late row arriving AFTER its window's state was evicted is
       DROPPED — it neither resurrects nor duplicates the window;
    2. every window is emitted AT MOST ONCE, with on-time counts only;
    3. the watermark does NOT promise to drop all late rows — one
       arriving in the same micro-batch as its window's eviction may
       still merge (docs: 'may or may not be aggregated').
    """
    import datetime as dt

    from llm_knowledge_graph_spark.streaming.windowed import (
        windowed_event_counts)

    def ev(eid, hour, minute):
        return (eid, dt.datetime(2024, 1, 1, hour, minute), 1,
                "view", 1.0, "{}")

    # f0 seeds window [1,2) and advances event time to 10:30 (watermark
    # 08:30 after batch 0); f1 advances again so batch 1 evicts+emits
    # window [1,2); f2 delivers a LATE 01:45 row for the already-
    # emitted window plus a 23:30 row that finalizes [10,11)/[11,12).
    schema = _write_event_files(
        spark, str(tmp_path / "ev_late"),
        [ev(0, 1, 30), ev(1, 10, 30)],
        [ev(2, 11, 30)],
        [ev(3, 1, 45), ev(4, 23, 30)],
    )
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "ev_late") + "/*"))
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("late_contract")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_late"))
         .trigger(availableNow=True).start())
    _drain(q, timeout=180)

    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    assert dropped == 1          # the post-eviction late row was dropped

    rows = spark.table("late_contract").collect()
    got = sorted((r["window_start"].hour, r["n"]) for r in rows)
    # window 1 exactly once with the ON-TIME count only; 23 unemitted
    # (watermark never passed midnight)
    assert got == [(1, 1), (10, 1), (11, 1)], got
