"""Int8 embedding quantization for the similarity/ANN path.

Not in the reference (its vectors live in Neo4j's float index); this is
the standard memory/bandwidth optimization for ANN at corpus scale:
symmetric per-vector int8 quantization shrinks the dominant column of
an embeddings table 4x (float32 -> tinyint) at a bounded cosine error,
which at 100 TB is the difference between an in-memory and a spilled
bucket join. Used by FAISS (SQ8), ScaNN, and every production vector
store's "scalar quantization" tier.

Contract (symmetric, per-vector):
  scale = max(|v_i|)           (stored once per vector, float)
  q_i   = round(v_i * 127 / scale)  in [-127, 127], tinyint
  v_i'  = q_i * scale / 127    (dequantization)

Zero-vector guard: scale 0 stores q = all zeros and dequantizes to the
zero vector (no division happens when scale = 0).

Everything is built-in higher-order array expressions — transform /
zip_with / aggregate on tinyint-int arithmetic, no UDFs, no Python in
the plan. The quantized dot product runs in INTEGER arithmetic
(sum of q_a*q_b fits int32 for dims <= ~130k at |q| <= 127) and only the
final normalization touches floats.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        keep: tuple = ("vec_id",)) -> DataFrame:
    """(keep..., q array<tinyint>, scale float) — symmetric int8."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0).cast("tinyint")))\
        .otherwise(F.transform(
            v, lambda x: F.round(x * 127.0 / scale).cast("tinyint")))
    return df.select(*keep, q.alias("q"),
                     scale.cast("float").alias("scale"))


def dequantize(q: Column, scale: Column) -> Column:
    """array<tinyint> + scale -> array<float> (the v' of the contract)."""
    return F.transform(q, lambda x: (x * scale / 127.0).cast("float"))


def _int_dot(a: Column, b: Column) -> Column:
    """Integer dot product of two int8 arrays (exact, no float drift)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0), lambda acc, x: acc + x)


def quantized_cosine_topk(quantized: DataFrame, query_vec,
                          k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine over an int8-quantized table against a
    float query vector: the query is quantized with the SAME contract,
    the dot product runs in integer arithmetic, and per-row norms come
    from the integer self-dots. Returns (vec_id, score) with score =
    the quantized cosine (float, 4-decimal rounded for determinism).

    Scale notes: one scan of the quantized table (4x smaller than the
    float table), one integer dot + two integer norms per row, a
    top-k window — same shape as similarity.cosine_topk but at a
    quarter of the scan bytes. The IVF/LSH bucketing strategies compose
    unchanged (bucket on the DEQUANTIZED prefix or the stored cells).
    """
    mx = max(abs(x) for x in query_vec) or 1.0
    # HALF_UP (away from zero), matching F.round / DuckDB round — NOT
    # Python's banker's round() (62.5 -> 62), and NOT floor(x+0.5):
    # for x just below a .5 boundary (0.49999999999999994) the IEEE sum
    # x+0.5 evaluates to exactly 1.0 and floor(x+0.5) rounds up where
    # F.round/DuckDB return 0. Decimal on repr(x) is boundary-exact.
    qq = [int(Decimal(repr(x * 127.0 / mx)).quantize(
              Decimal("1"), rounding=ROUND_HALF_UP)) for x in query_vec]
    qcol = F.array(*[F.lit(x).cast("tinyint") for x in qq])
    dot = _int_dot(F.col("q"), qcol)
    row_norm = F.sqrt(_int_dot(F.col("q"), F.col("q")).cast("double"))
    q_norm = float(sum(x * x for x in qq)) ** 0.5 or 1.0
    score = F.round(dot / (row_norm * F.lit(q_norm)), 4)
    ranked = (quantized
              .filter(row_norm > 0)
              .select("vec_id", score.alias("score"))
              .withColumn("rank", F.row_number().over(
                  Window.orderBy(F.desc("score"), "vec_id")))
              .filter(F.col("rank") <= k)
              .select("vec_id", "score")
              .orderBy(F.desc("score"), "vec_id"))
    return ranked
