"""Watermarked windowed aggregation + custom stateful streaming operators.

The reference is strictly batch (SURVEY §2.8 "Streaming: none"), but a
100 TB crawl pipeline ingests continuously — these are the two streaming
shapes the build brief calls first-class:

  * `windowed_event_counts`: readStream → withWatermark → window() agg —
    the standard late-data-tolerant rollup. With an `availableNow` trigger
    and `complete` output the drained result is deterministic and equals
    the batch groupBy-window (asserted in tests/test_streaming_windowed.py).
  * `streaming_first_seen` (applyInPandasWithState): incremental EXACT
    DEDUP — the streaming twin of dedup.exact_dedup. Per-key (digest
    prefix) state holds the set of seen digests; only first occurrences
    are emitted. State is bounded by distinct digests per prefix and
    partitioned by the uniform prefix key, so it shards evenly across
    executors at scale. GroupStateTimeout is deliberately off: crawl dedup
    wants exactly-once emission over the full history (state size = the
    dedup index itself, the same cost any dedup service pays).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(events_stream: DataFrame,
                          window_duration: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Per-(window, event_type) counts + exact value cents, tolerant of
    `watermark` of event-time lateness. Pure built-ins: watermark +
    window() keep state JVM-side and expire it at the watermark — no
    unbounded state, no Python."""
    win = (F.window("ts", window_duration, slide) if slide
           else F.window("ts", window_duration))
    # watermarks require TIMESTAMP (parquet often yields TIMESTAMP_NTZ)
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp"))
    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("value_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_cents"))


def batch_windowed_event_counts(events: DataFrame,
                                window_duration: str = "1 hour",
                                slide: str | None = None) -> DataFrame:
    """The batch twin (same expressions, no watermark) — the equality
    oracle for the drained stream."""
    win = (F.window("ts", window_duration, slide) if slide
           else F.window("ts", window_duration))
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events.groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("value_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_cents"))


def session_counts_stream(events_stream: DataFrame,
                          gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Stateful SESSION windows over the event stream: Structured
    Streaming's session_window merges event-time windows closer than
    `gap`, with state expired at the watermark — per-(user, session)
    event counts. The drained complete-mode result equals the batch
    session_window (and the lag-based SQL sessionization oracle)."""
    return (events_stream
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n"))


_FIRST_SEEN_OUT = "key string, doc_id long, digest string"
_FIRST_SEEN_STATE = "seen array<string>"


def _first_seen_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterable[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    # accumulate ALL Arrow chunks of this group's micro-batch BEFORE
    # sorting: a group larger than arrow.maxRecordsPerBatch arrives as
    # multiple frames, and sorting per-frame would let a later-chunk
    # smaller doc_id lose to an earlier-chunk larger one (chunk-boundary-
    # dependent output). "min doc_id wins per digest" must hold batch-wide.
    rows: list = []
    for pdf in pdfs:
        rows.extend(zip(pdf["doc_id"], pdf["digest"]))
    out_key: list = []
    out_id: list = []
    out_dg: list = []
    for doc_id, dg in sorted(rows, key=lambda t: t[0]):
        if dg not in seen:
            seen.add(dg)
            out_key.append(key[0]); out_id.append(int(doc_id))
            out_dg.append(dg)
    state.update((sorted(seen),))
    yield pd.DataFrame({"key": out_key, "doc_id": out_id, "digest": out_dg})


def streaming_first_seen(docs_stream: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         prefix_len: int = 2) -> DataFrame:
    """Streaming exact dedup: emit only the first occurrence of each text
    digest. State shards on the digest prefix (uniform 16^prefix_len
    keys); within a key the state is the digest set."""
    keyed = docs_stream.select(
        F.substring(F.md5(F.col(text_col)), 1, prefix_len).alias("key"),
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"))
    return (keyed.groupBy("key")
            .applyInPandasWithState(
                _first_seen_fn, _FIRST_SEEN_OUT, _FIRST_SEEN_STATE,
                "append", GroupStateTimeout.NoTimeout))
