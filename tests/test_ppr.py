"""Personalized PageRank (components.personalized_pagerank_exact):
bit-exact agreement with a plain-Python integer twin, zero rank for
nodes unreachable from the seeds, and seed-proximity ordering."""

from __future__ import annotations

import pytest


def ppr_py(edges, seeds, n_iter=8, damping_pct=85, scale=10 ** 12):
    """Plain-Python twin with the identical integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges}
                   | set(seeds))
    seeds = sorted(set(seeds))
    ns = len(seeds)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    keep = 100 - damping_pct
    seed_base = (scale * keep // 100) // ns
    r = {n: (scale // ns if n in seeds else 0) for n in nodes}
    for _ in range(n_iter):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += ((r[s] * damping_pct) // 100) // out[s]
        r = {n: (seed_base if n in seeds else 0) + contrib[n]
             for n in nodes}
    return r


# two components: a->b->c->a cycle + a->d fan; x->y disconnected
EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"),
         ("x", "y"), ("y", "x")]


def _spark_ppr(spark, seeds, n_iter=8):
    from llm_knowledge_graph_spark.operators.components import (
        personalized_pagerank_exact)
    e = spark.createDataFrame(EDGES, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "id string")
    return {r.id: r.rank_units
            for r in personalized_pagerank_exact(e, s, n_iter).collect()}


@pytest.mark.heavy
def test_ppr_matches_python_twin(spark):
    got = _spark_ppr(spark, ["a"])
    want = ppr_py(EDGES, ["a"])
    assert got == want


@pytest.mark.heavy
def test_ppr_unreachable_component_zero(spark):
    got = _spark_ppr(spark, ["a"])
    assert got["x"] == 0 and got["y"] == 0
    assert got["a"] > 0 and got["b"] > 0


@pytest.mark.heavy
def test_ppr_mass_bounded_and_seed_heavy(spark):
    got = _spark_ppr(spark, ["a"])
    # integer floor division only loses mass — never exceeds scale
    assert 0 < sum(got.values()) <= 10 ** 12
    # the seed outranks everything it merely points at
    assert got["a"] > got["d"]


@pytest.mark.heavy
def test_ppr_two_seeds_split(spark):
    got = _spark_ppr(spark, ["a", "x"])
    want = ppr_py(EDGES, ["a", "x"])
    assert got == want
    # the x<->y component now holds mass
    assert got["x"] > 0 and got["y"] > 0


@pytest.mark.heavy
def test_ppr_isolated_seed_keeps_teleport_share(spark):
    # Regression: a seed that is not an edge endpoint must still appear
    # in the output holding its own 1/ns restart mass — the old node
    # frame (edge endpoints only) silently destroyed half the teleport
    # mass and returned no row for the seeded node.
    got = _spark_ppr(spark, ["a", "zzz"])      # zzz has no edges
    want = ppr_py(EDGES, ["a", "zzz"])
    assert got == want
    assert "zzz" in got
    # zzz receives exactly init + per-iteration restart (nothing flows
    # in, nothing flows out): its final value is seed_base for ns=2
    assert got["zzz"] == (10 ** 12 * 15 // 100) // 2


def test_ppr_empty_seeds(spark):
    got = _spark_ppr(spark, [])
    assert set(got.values()) == {0}
