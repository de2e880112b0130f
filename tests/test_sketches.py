"""Sketch operators (operators/sketches.py): HyperLogLog, count-min,
bloom filter — each checked two ways:

1. **bit-exactness** against a plain-Python twin of the pinned md5
   contract (the sketch VALUE is the spec, not just its accuracy), and
2. **the probabilistic guarantee** the sketch exists for (HLL relative
   error, CMS never-undercounts, bloom zero-false-negatives).
"""

from __future__ import annotations

import pytest

import hashlib

from pyspark.sql import functions as F

from llm_knowledge_graph_spark.operators.sketches import (
    BLOOM_K, BLOOM_M, CMS_D, HLL_ALPHA_PPM, bloom_bitmap,
    bloom_membership_col, cms_counters, cms_estimate, hll_distinct)

_UNIT = 1 << 60


# ---------------------------------------------------------------------------
# plain-Python twins of the pinned contracts
# ---------------------------------------------------------------------------

def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _py_rho(tail: str) -> int:
    lz = len(tail) - len(tail.lstrip("0"))
    if lz == len(tail):
        return 4 * len(tail) + 1
    extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
        tail[lz], 0)
    return lz * 4 + extra + 1


def py_hll(items) -> int:
    regs: dict[int, int] = {}
    for it in set(items):
        h = _md5(str(it))
        bucket = int(h[:2], 16)
        rho = _py_rho(h[2:17])
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(0 if r > 60 else (1 << (60 - r)) for r in regs.values())
    s += (256 - len(regs)) * _UNIT
    return (HLL_ALPHA_PPM * 256 * 256 * _UNIT) // (s * 1000000)


def _cms_bucket(j: int, item: str) -> int:
    return int(_md5(f"{j}:{item}")[:3], 16)


def py_cms_estimates(counts: dict[str, int], probes) -> dict[str, int]:
    grid: dict[tuple[int, int], int] = {}
    for w, c in counts.items():
        for j in range(CMS_D):
            k = (j, _cms_bucket(j, w))
            grid[k] = grid.get(k, 0) + c
    return {w: min(grid[(j, _cms_bucket(j, w))] for j in range(CMS_D))
            for w in probes}


def _bloom_buckets(key: str) -> list[int]:
    return [int(_md5(f"{i}:{key}")[:4], 16) for i in range(BLOOM_K)]


def py_bloom(block_keys, probe_keys) -> dict[str, bool]:
    bits = set()
    for k in block_keys:
        bits.update(_bloom_buckets(k))
    return {p: all(b in bits for b in _bloom_buckets(p))
            for p in probe_keys}


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_matches_python_twin_and_error_bound(spark):
    # two keys with very different true cardinalities, including repeats
    rows = ([("big", f"item-{i % 3000}") for i in range(9000)]
            + [("small", f"tok-{i}") for i in range(200)])
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r.k: r.n_hll for r in hll_distinct(df, "k", "v").collect()}

    assert got["big"] == py_hll([f"item-{i % 3000}" for i in range(9000)])
    assert got["small"] == py_hll([f"tok-{i}" for i in range(200)])

    # raw-HLL accuracy: sigma ~= 1.04/sqrt(256) = 6.5% — allow 3 sigma
    assert abs(got["big"] - 3000) / 3000 < 0.20
    # 200 distinct at m=256 is below raw-HLL's sweet spot (linear-counting
    # territory, deliberately NOT corrected — pinned contract); just
    # require the right order of magnitude
    assert 80 <= got["small"] <= 500


@pytest.mark.heavy
def test_hll_ignores_duplicates_exactly(spark):
    # the estimate is a pure function of the DISTINCT set
    once = spark.createDataFrame(
        [("k", f"x{i}") for i in range(500)], "k string, v string")
    thrice = once.union(once).union(once)
    a = hll_distinct(once, "k", "v").collect()[0].n_hll
    b = hll_distinct(thrice, "k", "v").collect()[0].n_hll
    assert a == b


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

@pytest.mark.heavy
def test_cms_never_undercounts_and_matches_twin(spark):
    import random
    rng = random.Random(7)
    counts = {f"w{i}": rng.randint(1, 400) for i in range(3000)}
    df = spark.createDataFrame(list(counts.items()), "w string, cnt long")
    counters = cms_counters(df, "w", "cnt")
    probes = sorted(counts, key=lambda w: -counts[w])[:50]
    est = cms_estimate(
        df.filter(F.col("w").isin(probes)), counters, "w")
    got = {r.w: r.cms_est for r in est.collect()}
    twin = py_cms_estimates(counts, probes)
    for w in probes:
        assert got[w] == twin[w]
        assert got[w] >= counts[w]          # CMS upper-bound invariant


@pytest.mark.heavy
def test_cms_unseen_items_estimate_zero_or_collisions(spark):
    # A probe item never inserted must still get a row, with est = min
    # over its d cells COUNTING EMPTY CELLS AS 0 — the regression here
    # was an inner join that dropped empty cells (inflating unseen items
    # to min-over-colliding-cells, or losing the row entirely).
    counts = {f"w{i}": 10 for i in range(20)}   # sparse grid: most cells 0
    df = spark.createDataFrame(list(counts.items()), "w string, cnt long")
    counters = cms_counters(df, "w", "cnt")
    probes = [f"unseen-{i}" for i in range(200)]
    pdf = spark.createDataFrame([(p,) for p in probes], "w string")
    got = {r.w: r.cms_est for r in cms_estimate(pdf, counters, "w").collect()}
    grid: dict[tuple[int, int], int] = {}
    for w, c in counts.items():
        for j in range(CMS_D):
            k = (j, _cms_bucket(j, w))
            grid[k] = grid.get(k, 0) + c
    twin = {p: min(grid.get((j, _cms_bucket(j, p)), 0)
                   for j in range(CMS_D)) for p in probes}
    assert len(got) == len(probes)              # no probe vanishes
    assert got == twin
    # with 20 items in a 4x4096 grid, virtually every unseen probe hits
    # at least one empty cell -> estimates are overwhelmingly exact 0
    assert sum(1 for v in got.values() if v == 0) >= 190


def test_cms_grid_is_bounded(spark):
    df = spark.createDataFrame(
        [(f"t{i}", 1) for i in range(5000)], "w string, cnt long")
    assert cms_counters(df, "w", "cnt").count() <= CMS_D * 4096


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------

@pytest.mark.heavy
def test_bloom_no_false_negatives_and_matches_twin(spark):
    block = [f"blocked-{i}" for i in range(300)]
    clean = [f"clean-{i}" for i in range(2000)]
    bdf = spark.createDataFrame([(b,) for b in block], "dg string")
    words = bloom_bitmap(bdf, "dg")
    assert len(words) == BLOOM_M // 64

    probe = spark.createDataFrame(
        [(p,) for p in block + clean], "dg string")
    got = {r.dg: r.pos for r in probe.select(
        "dg", bloom_membership_col(F.col("dg"), words).alias("pos"))
        .collect()}
    twin = py_bloom(block, block + clean)
    assert got == twin
    # zero false negatives — every blocked key must test positive
    assert all(got[b] for b in block)
    # false-positive rate sanity: k=4, m=65536, n=300 → ~(kn/m)^k ≈ 1e-7;
    # even x1000 slack means 0 expected over 2000 probes
    assert sum(got[c] for c in clean) <= 2


# ---------------------------------------------------------------------------
# mergeability — the property that makes sketches work across shards
# ---------------------------------------------------------------------------

@pytest.mark.heavy
def test_hll_registers_merge_by_max(spark):
    from llm_knowledge_graph_spark.operators.sketches import (
        hll_estimate, hll_registers)
    rows = [("k", f"v{i}") for i in range(4000)]
    df = spark.createDataFrame(rows, "k string, v string")
    # disjoint-with-overlap shards (overlap must NOT double-count)
    a = df.filter(F.crc32(F.col("v")) % 3 != 0)
    b = df.filter(F.crc32(F.col("v")) % 3 != 1)
    merged = (hll_registers(a, "k", "v")
              .union(hll_registers(b, "k", "v"))
              .groupBy("k", "bucket").agg(F.max("r").alias("r")))
    whole = hll_distinct(df, "k", "v").collect()[0].n_hll
    via_merge = hll_estimate(merged, "k").collect()[0].n_hll
    assert via_merge == whole


@pytest.mark.heavy
def test_cms_grids_merge_by_sum(spark):
    counts = {f"w{i}": (i % 17) + 1 for i in range(2000)}
    df = spark.createDataFrame(list(counts.items()), "w string, cnt long")
    a = df.filter(F.crc32(F.col("w")) % 2 == 0)
    b = df.filter(F.crc32(F.col("w")) % 2 == 1)
    merged = (cms_counters(a, "w", "cnt")
              .union(cms_counters(b, "w", "cnt"))
              .groupBy("j", "bucket").agg(F.sum("c").alias("c")))
    probes = [f"w{i}" for i in range(0, 2000, 97)]
    pdf = df.filter(F.col("w").isin(probes))
    whole = {r.w: r.cms_est for r in
             cms_estimate(pdf, cms_counters(df, "w", "cnt"), "w").collect()}
    via_merge = {r.w: r.cms_est for r in
                 cms_estimate(pdf, merged, "w").collect()}
    assert via_merge == whole


@pytest.mark.heavy
def test_bloom_bitmaps_merge_by_or(spark):
    a_keys = [f"a{i}" for i in range(100)]
    b_keys = [f"b{i}" for i in range(100)]
    adf = spark.createDataFrame([(k,) for k in a_keys], "dg string")
    bdf = spark.createDataFrame([(k,) for k in b_keys], "dg string")
    both = spark.createDataFrame([(k,) for k in a_keys + b_keys],
                                 "dg string")
    wa, wb = bloom_bitmap(adf, "dg"), bloom_bitmap(bdf, "dg")

    def _u64(x):
        return x + (1 << 64) if x < 0 else x

    def _i64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    merged = [_i64(_u64(x) | _u64(y)) for x, y in zip(wa, wb)]
    assert merged == bloom_bitmap(both, "dg")


# ---------------------------------------------------------------------------
# histogram quantiles
# ---------------------------------------------------------------------------

def _py_hist_quantiles(vals, permilles, w):
    from collections import Counter
    bins = Counter(v // w for v in vals)
    total = sum(bins.values())
    out = {}
    for p in permilles:
        cum = 0
        for b in sorted(bins):
            cum += bins[b]
            if 1000 * cum >= p * total:
                out[p] = b * w
                break
    return out


def test_hist_quantiles_match_twin_and_bracket_truth(spark):
    import random
    from llm_knowledge_graph_spark.operators.sketches import (
        hist_bins, hist_quantiles)
    rng = random.Random(11)
    vals = [rng.randint(0, 5000) for _ in range(4000)]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    W = 100
    got = {(r.permille): r.lo for r in
           hist_quantiles(hist_bins(df, "k", "v", W), "k",
                          [500, 900, 990], W).collect()}
    twin = _py_hist_quantiles(vals, [500, 900, 990], W)
    assert got == twin
    # bracket guarantee: the true (ceil-rank) quantile lies in [lo, lo+W)
    sv = sorted(vals)
    for p in (500, 900, 990):
        rank = -(-p * len(sv) // 1000)            # ceil(p*n/1000)
        truth = sv[rank - 1]
        assert got[p] <= truth < got[p] + W


@pytest.mark.heavy
def test_hist_bins_merge_by_sum(spark):
    from pyspark.sql import functions as F2
    from llm_knowledge_graph_spark.operators.sketches import (
        hist_bins, hist_quantiles)
    a = spark.createDataFrame([("k", i % 700) for i in range(900)],
                              "k string, v long")
    b = spark.createDataFrame([("k", (i * 13) % 1900) for i in range(700)],
                              "k string, v long")
    W = 50
    merged = (hist_bins(a, "k", "v", W).union(hist_bins(b, "k", "v", W))
              .groupBy("k", "bin").agg(F2.sum("c").alias("c")))
    whole = hist_bins(a.union(b), "k", "v", W)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))
    qa = hist_quantiles(merged, "k", [500, 990], W).collect()
    qb = hist_quantiles(whole, "k", [500, 990], W).collect()
    assert sorted(map(tuple, qa)) == sorted(map(tuple, qb))
