"""Int8 embedding quantization (operators/quantize.py): roundtrip error
bound, exact integer dot products, and top-k recall vs the float
brute-force baseline on the real sf0.001 embeddings table."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_quantize_roundtrip_error_bound(spark):
    from llm_knowledge_graph_spark.operators.quantize import (
        dequantize, quantize_embeddings)
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 100))
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    q = quantize_embeddings(emb)
    back = {r.vec_id: list(r.deq) for r in
            q.select("vec_id",
                     dequantize(F.col("q"), F.col("scale")).alias("deq"))
            .collect()}
    for vid, v in orig.items():
        mx = max(abs(x) for x in v)
        for a, b in zip(v, back[vid]):
            # symmetric int8: per-component error <= scale/254 (+ float32
            # storage noise)
            assert abs(a - b) <= mx / 254 + 1e-6, vid


def test_quantize_zero_vector_guard(spark):
    from llm_knowledge_graph_spark.operators.quantize import (
        dequantize, quantize_embeddings)
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25])],
        "vec_id int, embedding array<double>")
    q = quantize_embeddings(df)
    rows = {r.vec_id: r for r in q.collect()}
    assert list(rows[1].q) == [0, 0, 0] and rows[1].scale == 0.0
    assert list(rows[2].q) == [64, -127, 32]  # round(x*127/max|x|)
    deq = {r.vec_id: list(r.d) for r in
           q.select("vec_id",
                    dequantize(F.col("q"), F.col("scale")).alias("d"))
           .collect()}
    assert deq[1] == [0.0, 0.0, 0.0]


def test_quantized_dot_is_exact_integer(spark):
    """The plan-side integer dot must equal the plain-Python integer dot
    (no float path in the middle)."""
    from llm_knowledge_graph_spark.operators.quantize import (
        _int_dot, quantize_embeddings)
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 50))
    q = quantize_embeddings(emb)
    qs = {r.vec_id: list(r.q) for r in q.collect()}
    probe = qs[0]
    pcol = F.array(*[F.lit(int(x)).cast("tinyint") for x in probe])
    got = {r.vec_id: r.dot for r in
           q.select("vec_id", _int_dot(F.col("q"), pcol).alias("dot"))
           .collect()}
    for vid, qv in qs.items():
        assert got[vid] == sum(int(a) * int(b)
                               for a, b in zip(qv, probe)), vid


@pytest.mark.heavy
def test_quantized_topk_recall_vs_float_baseline(spark):
    """Recall@10 of the int8 path vs the float brute force must be >= 0.9
    on the real embeddings table (standard SQ8 quality bar), and the
    self-hit must rank first with cosine ~1."""
    from llm_knowledge_graph_spark.operators.quantize import (
        quantize_embeddings, quantized_cosine_topk)
    from llm_knowledge_graph_spark.operators.similarity import (
        brute_force_topk)

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 300))
    qv = emb.filter(F.col("vec_id") == 7).collect()[0].embedding
    want = [r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()]
    q = quantize_embeddings(emb)
    got_rows = quantized_cosine_topk(q, qv, k=10).collect()
    got = [r.vec_id for r in got_rows]
    assert got[0] == 7
    assert got_rows[0].score >= 0.999
    assert len(set(got) & set(want)) >= 9  # recall@10 >= 0.9
    for r in got_rows:  # quantized cosine stays a valid cosine
        assert -1.0001 <= r.score <= 1.0001


@pytest.mark.heavy
def test_query_quantization_rounds_half_up_like_stored_rows(spark):
    """Regression: the query vector must quantize with the SAME rounding
    mode as the stored rows (F.round = HALF_UP, away from zero) — not
    Python's banker's round(), which maps 62.5 -> 62 while Spark and
    DuckDB both map it to 63. Exercised with components whose scaled
    value lands exactly on .5 (x * 127 / mx = 62.5 and -62.5)."""
    from llm_knowledge_graph_spark.operators.quantize import (
        quantize_embeddings, quantized_cosine_topk)

    qv = [0.625, -0.625, 1.27]          # mx=1.27 -> scaled 62.5, -62.5, 127
    emb = spark.createDataFrame([(0, qv)],
                                "vec_id int, embedding array<float>")
    stored = {r.vec_id: list(r.q) for r in
              quantize_embeddings(emb).collect()}[0]
    assert stored == [63, -63, 127]     # F.round HALF_UP, sign-aware
    # the self-query must therefore score exactly 1.0 (identical int8
    # vectors); banker's rounding gave [62, -62, 127] vs [63, -63, 127]
    row = quantized_cosine_topk(quantize_embeddings(emb), qv, k=1).collect()
    assert row[0].vec_id == 0 and row[0].score == 1.0
