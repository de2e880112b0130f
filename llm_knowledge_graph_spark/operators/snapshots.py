"""Crawl snapshot diffing — the incremental-ingest decision operator.

A continuously-refreshed corpus reprocesses only what changed between
crawl snapshots: *new* urls enter the pipeline, *changed* urls
re-extract and re-merge (the incremental KG path,
streaming/ingest.run_incremental_merge), *gone* urls tombstone, *same*
urls are skipped entirely — at 10^12 documents the skip rate IS the
cost model. The diff is one full-outer join on the url key comparing
content digests; both sides prune to (key, digest) before the join,
so the shuffle carries two thin columns, never the page bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  text_col: str = "text") -> DataFrame:
    """Per-key status between two snapshots:
    ``(key, status ∈ {new, gone, changed, same})`` by md5 digest of
    ``text_col``. Null texts digest as NULL and compare null-safely
    (two missing bodies are 'same')."""
    o = old.select(F.col(key_col).alias("k"),
                   F.md5(F.col(text_col).cast("string")).alias("od"),
                   F.lit(True).alias("in_old"))
    n = new.select(F.col(key_col).alias("k"),
                   F.md5(F.col(text_col).cast("string")).alias("nd"),
                   F.lit(True).alias("in_new"))
    j = o.join(n, "k", "full_outer")
    # presence flags, NOT digest nullness: a null text digests to NULL
    # but the url still exists in that snapshot
    status = (F.when(F.col("in_old").isNull(), "new")
              .when(F.col("in_new").isNull(), "gone")
              .when(F.col("od").eqNullSafe(F.col("nd")), "same")
              .otherwise("changed"))
    return j.select(F.col("k").alias(key_col), status.alias("status"))
