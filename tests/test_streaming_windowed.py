"""Watermarked windowed agg + applyInPandasWithState stateful dedup:
drained-stream vs batch equality, and cross-batch first-seen semantics."""

from __future__ import annotations

import pytest
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
