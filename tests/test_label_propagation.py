"""Deterministic synchronous label propagation fidelity
(components.label_propagation, Raghavan et al. 2007 with min-label
tie-break) — community recovery on planted structure, the bipartite
oscillation pin (the bound IS the semantics), and a randomized sweep
against a plain-Python synchronous oracle. The driver query
`word_communities` is additionally value-verified against a 4-round
unrolled DuckDB oracle on the real documents table."""

from __future__ import annotations

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


def test_lpa_bipartite_bound_is_the_semantics(spark):
    # a 2-path oscillates under synchronous updates: round counts with
    # different parity give different (both valid, both deterministic)
    # answers — the pinned bound defines the result
    edges = [("p", "q")]
    for rounds in (1, 2, 3, 4):
        assert _got(spark, edges, rounds) == _py_lpa(edges, rounds), rounds


def test_lpa_matches_python_randomized(spark):
    import random
    rng = random.Random(31)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = list({(rng.choice(nodes), rng.choice(nodes))
                  for _ in range(60)})
    for rounds in (1, 3, 4):
        assert _got(spark, edges, rounds) == _py_lpa(edges, rounds), rounds
