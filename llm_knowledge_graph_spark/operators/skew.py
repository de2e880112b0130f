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


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                dim_key: str, salt_col: str,
                n_salts: int = 8) -> DataFrame:
    """Skew-safe equi-join: REPLICATE the (small) ``dim`` side
    ``n_salts`` times and salt the ``fact`` side deterministically from
    ``salt_col`` (a per-row id), so a hot join key's fact rows spread
    across ``n_salts`` shuffle reducers instead of piling onto one — the
    classic manual salted-join, the same plan AQE's skew-join split
    produces at runtime, expressed statically so it also covers engines/
    configs without AQE and sorts-before-joins that AQE can't split.

    Exactness: replication uses explode(sequence(0, n-1)) and the fact
    salt is pmod(xxhash64(salt_col), n) — pure deterministic columns —
    so every fact row still meets every matching dim row exactly once
    and the result multiset is identical to ``fact.join(dim, key)``
    (which is exactly what the driver oracle verifies). Cost: the dim
    shuffle grows n_salts-fold — use on genuinely small dims (or
    broadcast instead when the dim fits; salting targets the case where
    the dim is too big to broadcast but far smaller than the fact).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    f = fact.withColumn("_salt", salt.cast("int"))
    # The dim key + salt get UNIQUE temp names before the join so the
    # post-join drop is side-unambiguous: a plain .drop("_salt", dim_key)
    # would drop BY NAME across both sides — with fact_key == dim_key the
    # join key itself would vanish from the result.
    d = (dim.withColumnRenamed(dim_key, "_dim_key")
            .withColumn("_dim_salt",
                        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))))
    cond = (f[fact_key] == d["_dim_key"]) & (f["_salt"] == d["_dim_salt"])
    return f.join(d, cond).drop("_salt", "_dim_key", "_dim_salt")
