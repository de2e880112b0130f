"""Skew-mitigation primitives for hot-key aggregation at crawl scale.

The graph sink already salts hot-entity WRITES (materialize.write_graph);
this module is the same discipline for AGGREGATIONS: a power-law key
distribution (domains, entities, boilerplate shingles) turns a plain
groupBy into a last-reducer straggler. ``salted_agg`` splits every group
into ``n_salts`` deterministic sub-groups, partially aggregates, then
reduces the n_salts partials per key — the classic two-phase combine,
expressed declaratively so Catalyst still map-side-combines phase 1.

Exactness: the salt is ``pmod(xxhash64(salt_col), n_salts)`` — a pure
deterministic column, no rand() — and both phases use algebraic
aggregates (SUM/COUNT/MIN/MAX), so the result is bit-identical to the
unsalted groupBy (which is exactly what the driver oracle verifies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, key_cols: list, sums: dict,
               salt_col: str, n_salts: int = 16,
               count_alias: str | None = None) -> DataFrame:
    """Two-phase SUM/COUNT by ``key_cols`` with an intermediate
    ``n_salts``-way salt derived from ``salt_col``.

    ``sums`` maps output alias -> input Column to sum (exact integer or
    decimal columns keep the result engine-exact). ``count_alias``
    optionally adds a row count. Equivalent to
    ``df.groupBy(*key_cols).agg(sum(...), count(*))`` but the wide
    shuffle carries at most ``n_groups * n_salts`` partial rows, so one
    hot key fans out across ``n_salts`` reducers instead of one.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("_salt")
    phase1_aggs = [F.sum(c).alias(a) for a, c in sums.items()]
    if count_alias:
        phase1_aggs.append(F.count("*").alias(count_alias))
    partial = (df.groupBy(*key_cols, salt).agg(*phase1_aggs))
    phase2_aggs = [F.sum(a).alias(a) for a in sums]
    if count_alias:
        phase2_aggs.append(F.sum(count_alias).alias(count_alias))
    return partial.groupBy(*key_cols).agg(*phase2_aggs)
