"""Vector/embedding column expressions (Q3/Q4 analogues; ref cosine
similarity usage code/pdf_graphrag.py:1082-1104).

Brute-force cosine stays JVM-side with higher-order functions
(zip_with + aggregate) — no Python, no UDF. The LSH-bucketed ANN variant is
in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard: cosine with a zero vector is defined as 0 here
    # (try_divide semantics) so ANSI mode never throws on degenerate input
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
