"""Sequence packing and sampling-weight operators for training-data
pipelines.

Neither exists in the reference (it feeds chunks to an LLM one at a
time), but both are core pre-training data-prep steps the build brief
asks for as first-class ops:

* :func:`pack_concat_chunk` — GPT-style "concatenate and chunk"
  sequence packing: documents are laid out in a deterministic order
  inside each stream and cut into fixed-capacity token bins; a
  document whose tokens straddle a boundary spills into the next bin.
  The per-doc bin assignment (the bin holding the doc's FIRST token)
  plus the spill mass is what a packer audit needs.

* :func:`temperature_weights` — multilingual temperature sampling
  (the mBERT/XLM-R alpha-exponent rebalancing, alpha = 0.5) with
  all-integer arithmetic so the weights are bit-identical across
  engines: share_ppm is an integer parts-per-million token share,
  the exponent is floor(sqrt(share_ppm)) (IEEE sqrt of an integer is
  exactly rounded, so its floor is deterministic), and the final
  weight is an integer ppm renormalization of those square roots.

Scale notes (100 TB): the packing cumsum is a window PARTITIONED BY
the stream column — one stream per (language, shard) in a real corpus
— so no global ordering is ever materialized and each stream's scan
is independent; skew is bounded by the largest single stream, which
the caller controls by sharding. temperature_weights scans the corpus
exactly once (a map-side-combinable per-language agg); the share and
renormalization totals are unpartitioned windows over the resulting
≤#langs-row frame, never over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunk(df: DataFrame, stream_col: str, order_col: str,
                      n_tok: Column, capacity: int) -> DataFrame:
    """Assign each row to its concat-and-chunk bin within its stream.

    Returns the input columns plus ``n_tok``, ``pack_start`` (tokens
    laid out before this doc in its stream), ``bin_id`` (the bin the
    doc's first token lands in) and ``spill_tokens`` (tokens of this
    doc flowing past its start bin's boundary — 0 when it fits).
    """
    w = (Window.partitionBy(stream_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (df.withColumn("n_tok", n_tok.cast("long"))
           .withColumn("pack_start",
                       F.coalesce(F.sum("n_tok").over(w), F.lit(0))))
    bin_id = F.expr(f"pack_start div {capacity}")
    return (out.withColumn("bin_id", bin_id)
            .withColumn(
                "spill_tokens",
                F.greatest(
                    F.col("pack_start") + F.col("n_tok")
                    - (bin_id + 1) * capacity,
                    F.lit(0).cast("long"))))


def pack_bin_stats(df: DataFrame, stream_col: str, order_col: str,
                   n_tok: Column, capacity: int) -> DataFrame:
    """Per-(stream, bin) packing audit: docs started, token mass of
    those docs, and the spill mass crossing the bin's right boundary."""
    packed = pack_concat_chunk(df, stream_col, order_col, n_tok, capacity)
    return (packed.groupBy(stream_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens_started"),
        F.sum("spill_tokens").alias("n_spill_tokens")))


def temperature_weights(df: DataFrame, lang_col: str,
                        n_tok: Column) -> DataFrame:
    """Integer-exact alpha=0.5 temperature sampling weights per language.

    Output: (lang, n_docs, n_tokens, share_ppm, isqrt_share,
    weight_ppm) — weight_ppm is 1e6 * floor(sqrt(share_ppm)) div the
    sum of those integer square roots, so low-resource languages are
    up-sampled exactly as the alpha-exponent rule prescribes while
    every emitted number stays a 64-bit integer.

    share_ppm is clamped to ≥1: a language whose token share floors to
    0 ppm (< total/1e6 tokens) would otherwise get weight 0 AND divide
    by zero in :func:`temperature_sample_rates`; with the clamp it gets
    the maximal up-weight instead, which is what temperature sampling
    means for a vanishing language. The 1e6 * n_tokens product rides
    DECIMAL(38,0) (mirrored as HUGEINT in the DuckDB oracle) so it
    cannot overflow int64 — at the 100 TB design point the corpus holds
    ~2.5e13 tokens and a plain BIGINT product would wrap at ~9.2e12.
    """
    per_lang = (df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok.cast("long")).alias("n_tokens")))
    # The corpus is scanned exactly ONCE (the agg above); everything
    # below runs on the ≤#langs-row aggregate, where an unpartitioned
    # window is a deliberate single-partition pass over ~100 rows —
    # NOT over the corpus.
    everything = Window.partitionBy()
    sh = (per_lang
          .withColumn("total_tokens", F.sum("n_tokens").over(everything))
          .withColumn("share_ppm", F.expr(
              "GREATEST(CAST(CAST(1000000 AS DECIMAL(38,0)) * n_tokens"
              " div total_tokens AS LONG), CAST(1 AS LONG))"))
          .withColumn("isqrt_share",
                      F.floor(F.sqrt(F.col("share_ppm").cast("double")))
                      .cast("long")))
    return (sh.withColumn("isqrt_total",
                          F.sum("isqrt_share").over(everything))
            .select("lang", "n_docs", "n_tokens", "share_ppm",
                    "isqrt_share",
                    F.expr("1000000 * isqrt_share div isqrt_total")
                    .alias("weight_ppm")))


def temperature_sample_rates(weights: DataFrame) -> DataFrame:
    """Per-language acceptance rates that realize the temperature
    distribution by pure subsampling (no upsampling): rate ∝
    weight/share, normalized so the most up-weighted language keeps
    everything. All-integer: the ratio rides 1e12-scaled fixed point,
    the max is a window over the ≤#langs-row frame. share_ppm ≥ 1 by
    :func:`temperature_weights`' clamp; the two wide products ride
    DECIMAL(38,0) (a 1-ppm-share language makes ratio_q ≈ 1e18, so the
    1e6 * ratio_q renorm product would wrap a plain BIGINT)."""
    r = weights.withColumn(
        "ratio_q", F.expr(
            "CAST(CAST(1000000000000 AS DECIMAL(38,0)) * weight_ppm"
            " div share_ppm AS LONG)"))
    return (r.withColumn("ratio_max",
                         F.max("ratio_q").over(Window.partitionBy()))
            .select("lang",
                    F.expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * ratio_q"
                           " div ratio_max AS LONG)")
                    .alias("rate_ppm")))


def temperature_resample(docs: DataFrame, rates: DataFrame,
                         lang_col: str, id_col: str,
                         width: int = 5) -> DataFrame:
    """Filter ``docs`` to the temperature-resampled corpus: a doc
    survives iff the first ``width`` hex chars of md5(id) fall below
    its language's rate threshold (fixed-length lowercase hex compares
    lexicographically == numerically; md5 is lowercase on both
    engines; a full rate maps to the sentinel 'g', above every hex
    string, so nothing is dropped by threshold truncation). The rates
    frame is tiny (one row per language) and broadcast; the decision
    is a pure projection — shuffle-free, stable under corpus growth
    (a doc's fate never depends on its neighbors)."""
    buckets = 16 ** width
    thr_hex = F.when(F.col("rate_ppm") >= 1_000_000, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(
            F.expr(f"rate_ppm * {buckets} div 1000000")), width, "0")))
    r = rates.select(F.col("lang").alias("_rate_lang"), "rate_ppm",
                     thr_hex.alias("_thr_hex"))
    keep = (F.substring(F.md5(F.col(id_col).cast("string")), 1, width)
            < F.col("_thr_hex"))
    return (docs.join(F.broadcast(r),
                      docs[lang_col] == F.col("_rate_lang"))
            .filter(keep)
            .drop("_rate_lang", "_thr_hex"))
