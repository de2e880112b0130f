"""Sequence packing (operators/packing.py) and the events funnel.

The packing test pins the concat-and-chunk contract to a hand-computed
layout; the temperature-weight test checks the alpha=0.5 rebalancing
invariants (integer outputs, low-resource up-weighting, ppm
normalization); the funnel test checks stage monotonicity plus the
within-window ordering constraints on the sf0.001 events table.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from llm_knowledge_graph_spark.operators.packing import (
    pack_bin_stats, pack_concat_chunk, temperature_weights)

SF_DIR = "/root/testdata/sf0.001"


def test_pack_concat_chunk_hand_computed(spark):
    # Stream layout (capacity 10): doc 1 (7 tok) fills [0,7); doc 2
    # (6 tok) starts at 7 in bin 0 and spills 3 into bin 1; doc 3
    # (12 tok) starts at 13 in bin 1 and spills 5 past bin 1's edge;
    # doc 4 (2 tok) starts at 25 in bin 2 and fits.
    rows = [(1, "s", 7), (2, "s", 6), (3, "s", 12), (4, "s", 2),
            (10, "t", 10)]  # second stream: exactly one full bin
    df = spark.createDataFrame(rows, "doc_id long, stream string, k long")
    out = pack_concat_chunk(df, "stream", "doc_id", F.col("k"),
                            capacity=10)
    got = {(r.stream, r.doc_id): (r.pack_start, r.bin_id, r.spill_tokens)
           for r in out.collect()}
    assert got[("s", 1)] == (0, 0, 0)
    assert got[("s", 2)] == (7, 0, 3)
    assert got[("s", 3)] == (13, 1, 5)
    assert got[("s", 4)] == (25, 2, 0)
    assert got[("t", 10)] == (0, 0, 0)

    stats = {(r.stream, r.bin_id): (r.n_docs, r.n_tokens_started,
                                    r.n_spill_tokens)
             for r in pack_bin_stats(df, "stream", "doc_id", F.col("k"),
                                     capacity=10).collect()}
    assert stats[("s", 0)] == (2, 13, 3)
    assert stats[("s", 1)] == (1, 12, 5)
    assert stats[("s", 2)] == (1, 2, 0)
    assert stats[("t", 0)] == (1, 10, 0)


def test_temperature_weights_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = temperature_weights(
        docs, "lang", F.size(F.split(F.col("text"), " "))).collect()
    assert len({r.lang for r in out}) == len(out) >= 2
    total_share = sum(r.share_ppm for r in out)
    assert 1_000_000 - len(out) <= total_share <= 1_000_000
    total_w = sum(r.weight_ppm for r in out)
    assert 1_000_000 - len(out) <= total_w <= 1_000_000
    # alpha=0.5 flattens: the dominant language's weight share must be
    # strictly below its token share; the smallest strictly above.
    hi = max(out, key=lambda r: r.n_tokens)
    lo = min(out, key=lambda r: r.n_tokens)
    assert hi.weight_ppm < hi.share_ppm
    assert lo.weight_ppm > lo.share_ppm
    for r in out:  # everything is integer-typed
        assert isinstance(r.share_ppm, int) and isinstance(r.weight_ppm, int)


@pytest.mark.heavy
def test_temperature_resample_invariants(spark):
    from llm_knowledge_graph_spark.operators.packing import (
        temperature_resample, temperature_sample_rates)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = temperature_weights(docs, "lang", n_tok)
    rates = temperature_sample_rates(w)
    rrows = {r.lang: r.rate_ppm for r in rates.collect()}
    # the most up-weighted language keeps everything; every rate ≤ 1e6
    assert max(rrows.values()) == 1_000_000
    assert all(0 < v <= 1_000_000 for v in rrows.values())
    kept = temperature_resample(docs, rates, "lang", "doc_id")
    per = {r.lang: r.n for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = [l for l, v in rrows.items() if v == 1_000_000]
    for lang in full:  # rate 1e6 ⇒ nothing dropped (the 'g' sentinel)
        assert per[lang] == tot[lang]
    # subsampling only, and deterministic across invocations
    assert all(per.get(l, 0) <= tot[l] for l in tot)
    again = temperature_resample(docs, rates, "lang", "doc_id").count()
    assert again == sum(per.values())


def test_temperature_zero_share_and_100tb_totals(spark):
    """Review findings (round 3): a language below total/1e6 tokens used
    to floor to share_ppm=0 — weight 0 AND a divide-by-zero in
    temperature_sample_rates under ANSI mode — and the 1e6 * n_tokens
    product wrapped int64 once the corpus passed ~9.2e12 tokens (below
    the 100 TB design point). share_ppm now clamps to ≥1 and the wide
    products ride DECIMAL(38,0)."""
    from llm_knowledge_graph_spark.operators.packing import (
        temperature_sample_rates)
    # 25e12-token dominant language (100 TB scale) + a 3-token one.
    rows = [("big", 25_000_000_000_000), ("tiny", 3)]
    df = spark.createDataFrame(rows, "lang string, n long")
    w = temperature_weights(df, "lang", F.col("n"))
    got = {r.lang: r for r in w.collect()}
    assert got["big"].share_ppm == 999_999  # no int64 wrap
    assert got["tiny"].share_ppm == 1       # clamped, not 0
    assert got["tiny"].weight_ppm > 0
    rates = {r.lang: r.rate_ppm
             for r in temperature_sample_rates(w).collect()}  # no div/0
    assert rates["tiny"] == 1_000_000  # vanishing language keeps all
    assert 0 < rates["big"] < rates["tiny"]


@pytest.mark.heavy
def test_events_funnel_monotone_and_windowed(spark):
    from llm_knowledge_graph_spark.plans.driver_queries import (
        q_events_funnel)
    out = {r.stage: r for r in q_events_funnel(spark, SF_DIR).collect()}
    assert set(out) == {"1_view", "2_click", "3_purchase"}
    assert (out["1_view"].n_users >= out["2_click"].n_users
            >= out["3_purchase"].n_users)
    assert out["1_view"].total_conv_us == 0
    # every conversion gap is within (0, 1 day] so the per-stage total
    # is bounded by n_users * 86400s
    for s in ("2_click", "3_purchase"):
        n, tot = out[s].n_users, out[s].total_conv_us
        if n:
            assert 0 < tot <= n * 86_400_000_000
