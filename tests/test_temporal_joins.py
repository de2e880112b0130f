"""Temporal join operators (operators/temporal.py) vs brute-force
oracles computed in plain Python on randomized fixtures.

asof_join is additionally pinned on hand-built edge cases: equal
left/right timestamps (inclusive bound), a left row before any right
row (inner drops / left keeps), and sub-second gaps that a
second-truncating implementation would misorder.

range_join_bucketed is compared against the O(n·m) per-key inequality
scan, with pairs planted exactly ON both window boundaries and pairs
1 microsecond outside them, across bucket boundaries.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llm_knowledge_graph_spark.operators.temporal import (asof_join,
                                                          range_join_bucketed)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(us: int) -> dt.datetime:
    return EPOCH + dt.timedelta(microseconds=us)


EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
])
VALUE_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("v", T.DoubleType()),
])


def _rand_events(rng, n, n_users, span_us):
    """Distinct (user, ts) rows — ties within a side would make both
    the operator and the oracle ambiguous, so the fixture avoids them
    (the operator docstring makes the same demand of callers)."""
    seen = set()
    rows = []
    while len(rows) < n:
        u = rng.randrange(n_users)
        us = rng.randrange(span_us)
        if (u, us) in seen:
            continue
        seen.add((u, us))
        rows.append((len(rows), u, us))
    return rows


class TestAsofJoin:
    def _oracle(self, lrows, rrows, how):
        """Plain-Python backward-inclusive as-of: greatest right ts <= left
        ts per key."""
        by_user = {}
        for u, us, v in rrows:
            by_user.setdefault(u, []).append((us, v))
        for lst in by_user.values():
            lst.sort()
        out = []
        for eid, u, us in lrows:
            best = None
            for rus, v in by_user.get(u, []):
                if rus <= us:
                    best = (rus, v)
            if best is not None:
                out.append((eid, best[1], us - best[0]))
            elif how == "left":
                out.append((eid, None, None))
        return sorted(out)

    def _run(self, spark, lrows, rrows, how):
        left = spark.createDataFrame(
            [(e, u, _ts(us)) for e, u, us in lrows], EVENT_SCHEMA)
        right = spark.createDataFrame(
            [(u, _ts(us), v) for u, us, v in rrows], VALUE_SCHEMA)
        got = asof_join(left, right, on="user_id", value_cols=["v"], how=how)
        rows = got.select(
            "event_id", "v",
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("_asof_ts").cast("timestamp"))).alias("gap"),
        ).collect()
        return sorted((r.event_id, r.v, r.gap) for r in rows)

    @pytest.mark.parametrize("how", ["inner", "left"])
    @pytest.mark.heavy
    def test_randomized_matches_oracle(self, spark, how):
        rng = random.Random(7)
        lrows = _rand_events(rng, 300, 12, 10_000_000)
        rrows = [(u, us, float(u * 1000 + us % 997))
                 for _, u, us in _rand_events(rng, 120, 12, 10_000_000)]
        assert self._run(spark, lrows, rrows, how) == \
            self._oracle(lrows, rrows, how)

    @pytest.mark.heavy
    def test_edges_inclusive_bound_and_subsecond(self, spark):
        # user 1: purchase exactly AT the click ts (inclusive → matches),
        # user 2: purchase 1us AFTER the click (no match),
        # user 3: two purchases 1us apart, both same truncated second —
        #         a second-truncating impl could pick the wrong one.
        lrows = [(0, 1, 5_000_000), (1, 2, 5_000_000), (2, 3, 5_000_001)]
        rrows = [(1, 5_000_000, 10.0), (2, 5_000_001, 20.0),
                 (3, 5_000_000, 30.0), (3, 5_000_001, 31.0)]
        assert self._run(spark, lrows, rrows, "inner") == [
            (0, 10.0, 0), (2, 31.0, 0)]
        assert self._run(spark, lrows, rrows, "left") == [
            (0, 10.0, 0), (1, None, None), (2, 31.0, 0)]


class TestRangeJoinBucketed:
    def _check(self, spark, lrows, rrows, lower_s, upper_s):
        lo, hi = lower_s * 1_000_000, upper_s * 1_000_000
        want = sorted(
            (le, re_) for le, lu, lus in lrows for re_, ru, rus in rrows
            if lu == ru and lo <= rus - lus <= hi)
        left = spark.createDataFrame(
            [(e, u, _ts(us)) for e, u, us in lrows], EVENT_SCHEMA)
        right = spark.createDataFrame(
            [(e, u, _ts(us)) for e, u, us in rrows], EVENT_SCHEMA)
        got = range_join_bucketed(left, right, on="user_id",
                                  lower_s=lower_s, upper_s=upper_s)
        rows = got.select("l_event_id", "r_event_id").collect()
        pairs = [(r.l_event_id, r.r_event_id) for r in rows]
        assert len(pairs) == len(set(pairs)), "duplicate candidate pairs"
        assert sorted(pairs) == want

    @pytest.mark.heavy
    def test_randomized_matches_bruteforce(self, spark):
        rng = random.Random(11)
        lrows = [(e, u, us) for e, u, us in _rand_events(rng, 250, 8,
                                                         20_000_000_000)]
        rrows = [(e + 10_000, u, us)
                 for e, u, us in _rand_events(rng, 250, 8, 20_000_000_000)]
        self._check(spark, lrows, rrows, lower_s=0, upper_s=3600)

    def test_nonzero_lower_bound(self, spark):
        rng = random.Random(13)
        lrows = _rand_events(rng, 150, 5, 40_000_000_000)
        rrows = [(e + 10_000, u, us)
                 for e, u, us in _rand_events(rng, 150, 5, 40_000_000_000)]
        self._check(spark, lrows, rrows, lower_s=600, upper_s=7200)

    def test_boundaries_exact_to_the_microsecond(self, spark):
        B = 3600 * 1_000_000
        # right rows at gap = 0, upper, upper+1us, -1us, and one in the
        # NEXT bucket but inside the window (cross-bucket candidate)
        lrows = [(0, 1, B - 1)]  # 1us before a bucket boundary
        rrows = [(100, 1, B - 1), (101, 1, 2 * B - 1), (102, 1, 2 * B),
                 (103, 1, B - 2), (104, 1, B + 5)]
        self._check(spark, lrows, rrows, lower_s=0, upper_s=3600)

    def test_rejects_empty_span(self):
        with pytest.raises(ValueError):
            range_join_bucketed(None, None, on="k", lower_s=5, upper_s=5)
