"""Local stand-in for the driver's correctness gate: runs every queries()
entry at sf0.01 and compares against oracle_sql() via DuckDB —
row count + column names + order-insensitive exact value comparison.

Driver-faithful detail: both sides are compared THROUGH pandas DataFrames
(Spark ``toPandas()`` vs DuckDB ``.df()``) so dtype artifacts the driver's
value hash sees are visible here too — e.g. DuckDB ``SUM(BIGINT)`` returns
HUGEINT which pandas renders as float64, mismatching Spark's int64 even
when the values are equal (the round-1 root cause for 10 hash misses).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf, cols):
    """Order-insensitive value fingerprint of a pandas DataFrame, columns
    sorted by name, floats rounded — dtype-sensitive via repr (int64 42
    != float64 42.0), like the driver's value hash.

    Iterates PER COLUMN (`pdf[c].tolist()` preserves each column's dtype
    scalars) — the round-2 iterrows() version upcast each ROW to a common
    dtype, so a mixed int/float result (e.g. cosine_topk: int vec_id +
    double score) upcast identically on both sides and masked exactly the
    int64-vs-float64 artifact the driver's value hash would reject."""
    col_vals = []
    for c in sorted(cols):
        vals = pdf[c].tolist()
        col_vals.append([repr(round(v, 9)) if isinstance(v, float) else repr(v)
                         for v in vals])
    return sorted(zip(*col_vals)) if col_vals else []


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from llm_knowledge_graph_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
            spark_cols = sorted(sdf.columns)
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows, cols={spark_cols}")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = sorted(rel.columns)
            duck_pdf = rel.df()
        except Exception as exc:
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"[FAIL] {name}: oracle error: {exc}")
            continue
        if spark_cols != duck_cols:
            failures.append((name, f"schema {spark_cols} != {duck_cols}"))
            print(f"[FAIL] {name}: schema {spark_cols} != {duck_cols}")
            continue
        if len(spark_pdf) != len(duck_pdf):
            failures.append((name, f"rowcount {len(spark_pdf)} != {len(duck_pdf)}"))
            print(f"[FAIL] {name}: rowcount {len(spark_pdf)} != {len(duck_pdf)}")
            continue
        # pandas-dtype KIND parity per column: tolist() below erases
        # numeric dtype (int32/int64 both become Python int, float64
        # becomes Python float), so an engine int against an oracle
        # FLOAT — the round-1 HUGEINT→float64 hash-miss root cause —
        # would slip through the value compare when every value reprs
        # equal. Driver calibration (round 3): int32-vs-int64 WIDTH is
        # fine (ship_delay_stats, cosine_topk etc. were driver
        # hash-green with int32 Spark vs int64 oracle), so only the
        # dtype KIND ('i' vs 'f' vs object...) is compared.
        dtype_diffs = [
            (c, str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
            for c in spark_cols
            if spark_pdf[c].dtype.kind != duck_pdf[c].dtype.kind
        ]
        if dtype_diffs:
            failures.append((name, f"dtypes differ: {dtype_diffs}"))
            print(f"[FAIL] {name}: dtypes differ: {dtype_diffs}")
            continue
        a = normalize(spark_pdf, spark_cols)
        b = normalize(duck_pdf, duck_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ: {diffs}"))
            print(f"[FAIL] {name}: values differ, e.g. {diffs}")
        else:
            print(f"[ ok ] {name}: {len(spark_pdf)} rows match")

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
