"""Round-3 pipeline-ops batch: PII redaction, RA link prediction,
duplicated-span mass, salted two-phase aggregation, hopping windows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_pii_redaction_counts_and_masking(spark):
    rows = [
        (1, "mail me at jo.doe+x@sub.example.org today"),
        (2, "server 192.168.0.1 and backup 10.0.0.254 up"),
        (3, "call 555-123-4567 or 555-000-1111 now"),
        (4, "clean text with no pii at all"),
        (5, "a@b.io from 1.2.3.4 dial 999-888-7777"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from llm_knowledge_graph_spark.operators import pii
    out = {r["doc_id"]: r for r in
           pii.redact(pii.pii_counts(df), "text").collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert out[1]["redacted"] == "mail me at <EMAIL> today"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["redacted"] == "server <IP> and backup <IP> up"
    assert out[3]["n_phone"] == 2
    assert out[3]["redacted"] == "call <PHONE> or <PHONE> now"
    assert out[4]["redacted"] == out[4]["text"]
    assert out[5]["redacted"] == "<EMAIL> from <IP> dial <PHONE>"


def test_pii_report_digest_matches_redacted_text(spark):
    df = spark.createDataFrame(
        [(7, "ping x@y.zw and 8.8.8.8")], "doc_id long, text string")
    from llm_knowledge_graph_spark.operators import pii
    rep = pii.pii_report(df, "doc_id").collect()[0]
    red = pii.redact(df).select(
        F.md5("redacted").alias("h"), F.length("redacted").alias("n")
    ).collect()[0]
    assert rep["redacted_md5"] == red["h"]
    assert rep["redacted_len"] == red["n"]


def test_link_prediction_ra_path_graph(spark):
    # path a-b-c-d: open wedges (a,c) via b, (b,d) via c; deg(b)=deg(c)=2
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "a string, b string")
    from llm_knowledge_graph_spark.operators.components import \
        link_prediction_ra
    got = {(r["x"], r["y"]): (r["n_common"], r["ra_score_units"])
           for r in link_prediction_ra(edges).collect()}
    assert got == {("a", "c"): (1, 10 ** 9 // 2),
                   ("b", "d"): (1, 10 ** 9 // 2)}


def test_link_prediction_ra_star_hub_capped(spark):
    # star: hub h connected to 4 leaves -> every leaf pair scores 1/4;
    # capping the hub degree below 4 kills all wedges
    edges = spark.createDataFrame(
        [("h", f"l{i}") for i in range(4)], "a string, b string")
    from llm_knowledge_graph_spark.operators.components import \
        link_prediction_ra
    full = link_prediction_ra(edges).collect()
    assert len(full) == 6  # C(4,2) leaf pairs
    assert all(r["ra_score_units"] == 10 ** 9 // 4 for r in full)
    assert link_prediction_ra(edges, max_degree=3).count() == 0


def test_duplicate_shingle_mass(spark):
    span = "q w e r t y u i"          # the shared 8-gram
    rows = [(1, span + " alpha beta"),
            (2, "zz " + span),
            (3, "totally different words one two three four five six")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from llm_knowledge_graph_spark.operators.dedup import \
        duplicate_shingle_mass
    got = {r["id"]: r for r in duplicate_shingle_mass(df, n=8).collect()}
    # doc1: 3 shingles, 1 duplicated -> 333 permille; doc2: 2 shingles
    assert (got[1]["n_shingles"], got[1]["n_dup_shingles"],
            got[1]["dup_permille"]) == (3, 1, 333)
    assert (got[2]["n_shingles"], got[2]["n_dup_shingles"],
            got[2]["dup_permille"]) == (2, 1, 500)
    assert got[3]["n_dup_shingles"] == 0


def test_salted_sum_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [(i % 3, i, i * 7 % 11) for i in range(200)],
        "k long, sid long, v long")
    from llm_knowledge_graph_spark.operators.skew import salted_sum
    got = {r["k"]: (r["s"], r["n"]) for r in salted_sum(
        df, ["k"], {"s": F.col("v")}, salt_col="sid", n_salts=8,
        count_alias="n").collect()}
    want = {r["k"]: (r["s"], r["n"]) for r in
            df.groupBy("k").agg(F.sum("v").alias("s"),
                                F.count("*").alias("n")).collect()}
    assert got == want


def test_hopping_window_multiplicity(spark):
    # one event lands in exactly windowDuration/slide = 4 hopping windows
    df = spark.createDataFrame(
        [("2024-01-01 10:17:00",)], "ts_s string").select(
        F.col("ts_s").cast("timestamp").alias("ts"))
    win = (df.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"))
           .count().select(F.col("w.start").alias("s")).collect())
    starts = sorted(r["s"].strftime("%H:%M") for r in win)
    assert starts == ["08:30", "09:00", "09:30", "10:00"]


@pytest.mark.heavy
def test_link_prediction_ra_random_graphs_property(spark):
    """Randomized cross-check of the Spark RA wedge-join against a
    plain-Python oracle (fixed seeds — deterministic)."""
    import itertools
    import random

    from llm_knowledge_graph_spark.operators.components import \
        link_prediction_ra

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(10)]
        edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                        for _ in range(14)})
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for x, y in itertools.combinations(sorted(adj), 2):
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if common:
                want[(x, y)] = (len(common),
                                sum(10 ** 9 // len(adj[z]) for z in common))
        df = spark.createDataFrame(edges, "a string, b string")
        got = {(r["x"], r["y"]): (r["n_common"], r["ra_score_units"])
               for r in link_prediction_ra(df).collect()}
        assert got == want, f"seed {seed}"
