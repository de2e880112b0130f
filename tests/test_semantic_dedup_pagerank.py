"""Round-3 additions: SemDeDup-style semantic dedup and integer-exact
PageRank — operator-level fidelity against plain-Python oracles (the
driver-surface queries `doc_semantic_dedup` / `word_pagerank` are
additionally value-verified against DuckDB SQL)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _unit(*coords):
    import math
    n = math.sqrt(sum(c * c for c in coords))
    return [c / n for c in coords]


@pytest.fixture(scope="module")
def chain_embeddings(spark):
    """A transitive near-dup chain: 0~1 and 1~2 are above the cosine
    threshold but 0~2 is BELOW it — the case where pairwise thresholding
    alone under-merges and connected components must close the chain.
    Ids 10/11 are an isolated near-dup pair; 20 is a semantic singleton."""
    import math
    a = 0.0
    b = math.radians(30)   # cos(0,1)=cos30≈0.866 ≥ 0.8
    c = math.radians(60)   # cos(1,2)=cos30; cos(0,2)=cos60=0.5 < 0.8
    rows = [
        (0, _unit(math.cos(a), math.sin(a), 0.0)),
        (1, _unit(math.cos(b), math.sin(b), 0.0)),
        (2, _unit(math.cos(c), math.sin(c), 0.0)),
        (10, _unit(0.0, 0.0, 1.0)),
        (11, _unit(0.01, 0.0, 1.0)),
        (20, _unit(-1.0, 0.1, 0.0)),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


@pytest.mark.heavy
def test_semantic_dedup_closes_transitive_chain(chain_embeddings):
    from llm_knowledge_graph_spark.operators.dedup import semantic_dedup
    mapping = {r.id: r.rep
               for r in semantic_dedup(chain_embeddings,
                                       threshold=0.8).collect()}
    assert mapping == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_semantic_dedup_matches_union_find_on_testdata(spark):
    """Engine vs plain-Python oracle (brute-force cosine + union-find) on
    the real sf0.001 embeddings table."""
    import numpy as np

    emb = (spark.read
           .parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter(F.col("vec_id") < 200))
    rows = sorted((r.vec_id, np.asarray(r.embedding, dtype=np.float64))
                  for r in emb.collect())
    ids = [i for i, _ in rows]
    mat = np.stack([v for _, v in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = np.round(mat @ mat.T, 4)

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            if sim[ai, bi] >= 0.40:
                ra, rb = find(ids[ai]), find(ids[bi])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min-of-component (union-find roots are already the
    # min because we always parent the larger root onto the smaller)
    expected = {i: find(i) for i in ids}

    from llm_knowledge_graph_spark.operators.dedup import semantic_dedup
    got = {r.id: r.rep for r in semantic_dedup(emb, threshold=0.40).collect()}
    assert got == expected


@pytest.mark.heavy
def test_semantic_dedup_long_chain_beyond_label_prop_cap(spark):
    """Review finding (round 3): semantic_dedup used label propagation
    with a 25-round cap, silently under-merging any near-dup chain of
    diameter > 25 while the DuckDB oracle computes the full transitive
    closure. Both paths must now reach the fixpoint on a 35-link chain:
    the driver union-find exactly, and the star-contraction scale path
    (forced via driver_threshold=0) in O(log n) rounds."""
    from llm_knowledge_graph_spark.operators.dedup import semantic_dedup

    n = 36
    emb = spark.createDataFrame([(i, [1.0]) for i in range(n)],
                                "vec_id int, embedding array<double>")
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "a int, b int")
    expect = {i: 0 for i in range(n)}
    via_driver = {r.id: r.rep
                  for r in semantic_dedup(emb, pairs=chain).collect()}
    assert via_driver == expect
    via_star = {r.id: r.rep
                for r in semantic_dedup(emb, pairs=chain,
                                        driver_threshold=0).collect()}
    assert via_star == expect


def _python_pagerank(edges, n_iterations=10, damping_pct=85, scale=10 ** 12):
    """All-integer PageRank twin of components.pagerank_exact."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (100 - damping_pct) // 100) // n
    ranks = {v: scale // n for v in nodes}
    for _ in range(n_iterations):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (ranks[s] * damping_pct // 100) // outdeg[s]
        ranks = nxt
    return ranks


@pytest.mark.heavy
def test_pagerank_exact_matches_python_oracle(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("d", "a"), ("e", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from llm_knowledge_graph_spark.operators.components import pagerank_exact
    got = {r.id: r.rank_units for r in pagerank_exact(df).collect()}
    assert got == _python_pagerank(edges)
    # sanity: the sink-heavy hub outranks the leaf
    assert got["c"] > got["e"]


@pytest.mark.heavy
def test_pagerank_exact_is_deterministic_across_partitioning(spark):
    """Bit-identical rank_units at different parallelism — the integer
    arithmetic removes float-sum order sensitivity (the property the
    driver's value hash relies on)."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    edges = [(s, d) for s, d in edges if s != d]
    from llm_knowledge_graph_spark.operators.components import pagerank_exact
    df1 = spark.createDataFrame(edges, "src string, dst string").coalesce(1)
    df8 = spark.createDataFrame(edges, "src string, dst string").repartition(8)
    r1 = {r.id: r.rank_units for r in pagerank_exact(df1, 5).collect()}
    r8 = {r.id: r.rank_units for r in pagerank_exact(df8, 5).collect()}
    assert r1 == r8 == _python_pagerank(edges, n_iterations=5)


@pytest.mark.heavy
def test_triangle_count_known_graphs(spark):
    from llm_knowledge_graph_spark.operators.components import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "a string, b string")
        return triangle_count(df).collect()[0]

    # K4: 4 triangles; duplicate + reversed + self-loop edges must not
    # change the census of the underlying simple graph
    k4 = [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
    noisy = k4 + [(b, a) for a, b in k4] + [("w", "w"), ("x", "y")]
    r = tri(noisy)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)

    # star graph (hub h, leaves 0..9): the degree-ordered orientation
    # generates ZERO wedges at the hub — and there are no triangles
    star = [("h", f"l{i}") for i in range(10)]
    r = tri(star)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (11, 10, 0)

    # hub + one closed leaf pair → exactly 1 triangle
    r = tri(star + [("l0", "l1")])
    assert r.n_triangles == 1


@pytest.mark.heavy
def test_semantic_dedup_lsh_scale_path_same_clusters(spark):
    """The LSH pair generator (scale path) must feed semantic_dedup to the
    SAME clusters as the brute-force baseline when LSH recall is 1.0 —
    exact duplicates collide in every band of every table, so planted
    bit-identical vectors are always recovered."""
    from llm_knowledge_graph_spark.operators.dedup import semantic_dedup
    from llm_knowledge_graph_spark.operators.similarity import (
        lsh_cosine_near_dup_pairs)

    e = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
         .filter(F.col("vec_id") < 100).select("vec_id", "embedding"))
    planted = e.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    corpus = e.unionByName(planted)

    brute = {r.id: r.rep
             for r in semantic_dedup(corpus, threshold=0.999).collect()}
    lsh_pairs = lsh_cosine_near_dup_pairs(corpus, threshold=0.999)
    via_lsh = {r.id: r.rep
               for r in semantic_dedup(corpus, pairs=lsh_pairs).collect()}
    assert via_lsh == brute
    assert all(via_lsh[v + 1000] == v for v in range(100))


@pytest.mark.heavy
def test_triangle_count_random_graphs_property(spark):
    """Randomized cross-check of the degree-ordered wedge closure against
    a plain-Python triangle enumerator (fixed seeds — deterministic)."""
    import itertools
    import random

    from llm_knowledge_graph_spark.operators.components import triangle_count

    for seed, n, m in ((7, 12, 30), (11, 9, 16), (13, 15, 50)):
        rng = random.Random(seed)
        edges = [(f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")
                 for _ in range(m)]
        simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        adj = {}
        for a, b in simple:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expected = sum(
            1 for x, y, z in itertools.combinations(sorted(adj), 3)
            if y in adj[x] and z in adj[x] and z in adj[y])
        r = triangle_count(
            spark.createDataFrame(edges, "a string, b string")).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (
            len(adj), len(simple), expected), f"seed={seed}"


@pytest.mark.heavy
def test_bfs_distances_min_depth_and_cap(spark):
    """BFS must emit each vertex at its MINIMAL distance (the anti-join
    contract), honor the depth cap, ignore unreachable vertices, and
    support multi-source seeds."""
    from llm_knowledge_graph_spark.operators.components import bfs_distances

    #   s → a → b → c → d        (chain)
    #   s → b                    (shortcut: b is dist 1, not 2)
    #   x → s                    (x unreachable FROM s — directed)
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "c"), ("c", "d"),
         ("s", "b"), ("x", "s")],
        "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "id string")

    got = {r.id: r.dist for r in bfs_distances(edges, seeds, 4).collect()}
    assert got == {"s": 0, "a": 1, "b": 1, "c": 2, "d": 3}

    capped = {r.id: r.dist
              for r in bfs_distances(edges, seeds, 2).collect()}
    assert capped == {"s": 0, "a": 1, "b": 1, "c": 2}

    multi = {r.id: r.dist
             for r in bfs_distances(
                 edges, spark.createDataFrame([("s",), ("c",)],
                                              "id string"), 4).collect()}
    assert multi == {"s": 0, "c": 0, "a": 1, "b": 1, "d": 1}


@pytest.mark.heavy
def test_k_core_peels_cascade(spark):
    """Clique K4 + a pendant chain: the 3-core is exactly the clique,
    and the chain peels over MULTIPLE rounds (a one-round degree filter
    would leave chain remnants)."""
    from pyspark.sql import functions as F
    from llm_knowledge_graph_spark.operators.components import k_core
    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f"), ("f", "g")]
    extra = [("e", "c")]  # e has degree 3 initially, still not core
    edges = spark.createDataFrame(clique + chain + extra,
                                  "src string, dst string")
    got = {r.id: r.deg for r in k_core(edges, k=3, rounds=5).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # one round is NOT enough: e survives round 1 (degree 3: d, f, c)
    one = {r.id for r in k_core(edges, k=3, rounds=1).collect()}
    assert "e" in one
