"""Local stand-in for the driver's correctness gate: runs every queries()
entry at sf0.01 and compares against oracle_sql() via DuckDB —
row count + column names + order-insensitive exact value comparison.

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


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append((c, repr(v)))
        out.append(tuple(v for _, v in sorted(vals)))
    return sorted(out)


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
            spark_rows = [r.asDict() for r in sdf.collect()]
            spark_cols = sorted(sdf.columns)
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows, cols={spark_cols}")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = sorted(rel.columns)
            duck_rows = [dict(zip(rel.columns, row)) for row in rel.fetchall()]
        except Exception as exc:
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"[FAIL] {name}: oracle error: {exc}")
            continue
        if spark_cols != duck_cols:
            failures.append((name, f"schema {spark_cols} != {duck_cols}"))
            print(f"[FAIL] {name}: schema {spark_cols} != {duck_cols}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append((name, f"rowcount {len(spark_rows)} != {len(duck_rows)}"))
            print(f"[FAIL] {name}: rowcount {len(spark_rows)} != {len(duck_rows)}")
            continue
        a = normalize(spark_rows, spark_cols)
        b = normalize(duck_rows, duck_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ: {diffs}"))
            print(f"[FAIL] {name}: values differ, e.g. {diffs}")
        else:
            print(f"[ ok ] {name}: {len(spark_rows)} rows match")

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
