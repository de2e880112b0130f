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
# packed binary blob of fixed-width md5 digests (16 bytes each) — 2x
# smaller than the round-2 array<string> of hex digests and, critically,
# APPEND-ONLY: each batch appends only the delta, never re-sorts or
# rewrites the existing bytes (merge_first_seen is the pure core).
# NOTE: this is a STATE SCHEMA CHANGE vs the round-2 array<string> —
# a stream resumed from a round-2 checkpoint cannot migrate (discard the
# checkpoint and re-drain; exactly-once emission then restarts fresh)
_FIRST_SEEN_STATE = "seen binary"
_DIGEST_W = 16


def merge_first_seen(seen_blob: bytes,
                     rows: Iterable[Tuple[int, str]]):
    """Pure core of the stateful dedup: (state_blob, [(doc_id, hex_digest)])
    → (new_blob, first_seen_rows).

    The blob is a concatenation of fixed-width (16-byte) md5 digests in
    first-seen order. New digests are APPENDED — the existing prefix is
    byte-identical in the output (delta-append: per-batch state growth is
    exactly 16 * n_new bytes, asserted in tests), so quiet batches cost a
    set-build but no reordering/rewriting of prior state, and the caller
    can skip state.update entirely when the blob is unchanged.
    "min doc_id wins per digest" holds batch-wide (rows sorted by doc_id).
    """
    seen = {seen_blob[i:i + _DIGEST_W]
            for i in range(0, len(seen_blob), _DIGEST_W)}
    delta = bytearray()
    emitted = []
    for doc_id, dg in sorted(rows, key=lambda t: t[0]):
        raw = bytes.fromhex(dg)
        if raw not in seen:
            seen.add(raw)
            delta += raw
            emitted.append((int(doc_id), dg))
    return bytes(seen_blob) + bytes(delta), emitted


def _first_seen_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterable[pd.DataFrame]:
    blob = bytes(state.get[0]) if state.exists else b""
    # accumulate ALL Arrow chunks of this group's micro-batch BEFORE
    # sorting: a group larger than arrow.maxRecordsPerBatch arrives as
    # multiple frames, and sorting per-frame would let a later-chunk
    # smaller doc_id lose to an earlier-chunk larger one (chunk-boundary-
    # dependent output). "min doc_id wins per digest" must hold batch-wide.
    rows: list = []
    for pdf in pdfs:
        rows.extend(zip(pdf["doc_id"], pdf["digest"]))
    new_blob, emitted = merge_first_seen(blob, rows)
    if len(new_blob) != len(blob):  # quiet shard → no state rewrite at all
        state.update((new_blob,))
    yield pd.DataFrame({"key": [key[0]] * len(emitted),
                        "doc_id": [i for i, _ in emitted],
                        "digest": [d for _, d in emitted]})


def first_seen_prefix_len(corpus_digests: int,
                          target_state_per_key: int = 100_000) -> int:
    """Sizing rule for `streaming_first_seen`'s shard count: the smallest
    prefix_len with expected digests-per-shard ≤ target (shards are the
    16^prefix_len uniform md5 prefixes). target=100k digests ≈ 1.6 MB of
    packed state per key — a comfortable per-batch (de)serialize unit.

        corpus digests   prefix_len   shards      digests/shard
        1e6              1            16           62.5k
        1e8              2            256          390k → 3 (4096, 24k)
        1e9              3            4096         244k → 4 (65536, 15k)
        1e12             5            1,048,576    ~954k → 6 (16.7M, 60k)

    (At 10^12 docs the state store itself would be RocksDB-backed; the
    shard count only needs to keep each key's blob bounded.)
    """
    n = 1
    while corpus_digests / (16 ** n) > target_state_per_key and n < 16:
        n += 1
    return n


def streaming_first_seen(docs_stream: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         prefix_len: int = 2) -> DataFrame:
    """Streaming exact dedup: emit only the first occurrence of each text
    digest. State shards on the digest prefix (uniform 16^prefix_len
    keys); within a key the state is an append-only packed-binary digest
    blob (see merge_first_seen — per-batch growth is exactly the delta;
    unchanged shards skip the state write). Size prefix_len with
    `first_seen_prefix_len(expected_corpus_digests)` — the round-2 default
    of 2 (256 shards) is right for ~10^7-10^8 digests."""
    keyed = docs_stream.select(
        F.substring(F.md5(F.col(text_col)), 1, prefix_len).alias("key"),
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"))
    return (keyed.groupBy("key")
            .applyInPandasWithState(
                _first_seen_fn, _FIRST_SEEN_OUT, _FIRST_SEEN_STATE,
                "append", GroupStateTimeout.NoTimeout))


def streaming_hll_registers(stream_df: DataFrame, key_col: str,
                            item_col: str) -> DataFrame:
    """Streaming distinct-count sketch: the HyperLogLog register build
    (operators/sketches.hll_registers) run AS the streaming aggregation.
    State is exactly the register table — ≤256 rows per key FOREVER,
    whatever the stream has seen — because max(rho) is the mergeable
    accumulator; micro-batches fold in by the same MAX the shard-merge
    law uses (tests/test_sketches.py::test_hll_registers_merge_by_max).
    Contrast with streaming_first_seen, whose exact-dedup state is
    necessarily corpus-sized: the sketch answers "how many distinct"
    with O(m) state instead.

    Drain with complete output + availableNow, then finish the drained
    registers with sketches.hll_estimate — equality with the batch
    hll_distinct is asserted in tests/test_streaming_windowed.py."""
    from ..operators.sketches import hll_registers
    return hll_registers(stream_df, key_col, item_col)


def streaming_cms_counters(stream_counts: DataFrame, item_col: str,
                           weight_col: str) -> DataFrame:
    """Streaming heavy-hitter sketch: the count-min grid build
    (operators/sketches.cms_counters) run AS the streaming aggregation.
    State is the d×w counter grid itself — ≤16,384 rows forever —
    because elementwise + is the mergeable accumulator (the same law
    tests/test_sketches.py::test_cms_grids_merge_by_sum pins for batch
    shards). Drain with complete output, then point-estimate from the
    drained grid with sketches.cms_estimate; estimates match the batch
    grid exactly (asserted in tests/test_streaming_windowed.py)."""
    from ..operators.sketches import cms_counters
    return cms_counters(stream_counts, item_col, weight_col)


def user_tier_dim(events_batch: DataFrame) -> DataFrame:
    """Deterministic user→tier dimension derived from the batch events
    table (the sandbox has no separate users table): tier cycles with
    user_id % 4 and carries an integer points multiplier. Stands in for
    the slowly-changing profile/dim table a real pipeline joins."""
    tier = (F.when(F.col("user_id") % 4 == 0, "bronze")
            .when(F.col("user_id") % 4 == 1, "silver")
            .when(F.col("user_id") % 4 == 2, "gold")
            .otherwise("vip"))
    return (events_batch.select("user_id").distinct()
            .withColumn("tier", tier)
            .withColumn("mult", (F.col("user_id") % 4 + 1).cast("long")))


def stream_static_enriched_counts(events_stream: DataFrame,
                                  dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: per-micro-batch BROADCAST hash join of
    the unbounded event stream against a bounded static dimension, then
    a global per-tier rollup — the canonical 'enrich the firehose with
    the profile table' shape. The static side is re-planned each batch
    (so a dim refresh is picked up) and never shuffles the stream; the
    join itself is stateless, all streaming state lives in the final
    aggregation (one row per tier). Integer cents/points only."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (events_stream.join(F.broadcast(dim), "user_id")
            .groupBy("tier")
            .agg(F.count("*").alias("n_events"),
                 F.sum(cents).alias("value_cents"),
                 F.sum(cents * F.col("mult")).alias("points")))


def batch_stream_static_enriched_counts(events: DataFrame,
                                        dim: DataFrame) -> DataFrame:
    """Batch twin of stream_static_enriched_counts (equality oracle)."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (events.join(F.broadcast(dim), "user_id")
            .groupBy("tier")
            .agg(F.count("*").alias("n_events"),
                 F.sum(cents).alias("value_cents"),
                 F.sum(cents * F.col("mult")).alias("points")))
