"""Connected components over similarity edges — canonicalization (north rule).

Min-label propagation as an iterative DataFrame self-join with a
checkpointed frontier:

    label(v) ← min(label(v), min over neighbors u of label(u))

until a fixpoint. Each iteration shuffles on the node id; `localCheckpoint`
truncates the lineage every round so plan size / stack depth stays constant
(mandatory — ref SURVEY §4.2). Convergence in O(diameter) rounds; alias
clusters have diameter ≤ 2-3, and the iteration cap guards pathological
chains. For planet-scale graphs swap the loop body for the large-star /
small-star rewrite (Kiveris et al., "Connected Components in MapReduce"),
which converges in O(log n) — the surrounding contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iterations: int = 25) -> DataFrame:
    """vertices(id), edges(a, b) → (id, component) with component = min id
    (lexicographic) of the member set. Deterministic and idempotent."""
    # undirected: propagate both ways
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    labels = vertices.select("id", F.col("id").alias("component")).localCheckpoint()
    for _ in range(max_iterations):
        msgs = (
            sym.join(labels, sym["src"] == labels["id"])
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id").agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")))
                .alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
        ).localCheckpoint()  # truncate lineage each round
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("id", "component")
        if n_changed == 0:
            break
    return labels


def driver_union_find(edges: list) -> dict:
    """Union-find over (a, b) pairs — the small-graph fast path. The
    similarity graph holds only LINKED DISTINCT NAMES (≪ corpus size), so
    below a size threshold a driver-side pass beats ~10 distributed jobs.
    Returns {id: canonical_id} with canonical = min of member set."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def canonical_mapping(nodes: DataFrame, sim_edges: DataFrame,
                      max_iterations: int = 25,
                      driver_threshold: int = 200_000) -> DataFrame:
    """sim_edges(a, b, type) → (type, id, canonical_id) for LINKED ids only
    (absent id ⇒ identity; rewrite_canonical coalesces).

    Components per (type, id): the type is folded into the vertex key so
    equal names of different types never merge. Vertices are restricted to
    similarity-edge endpoints — linked distinct names, a tiny set relative
    to the corpus — so canonicalization cost is corpus-size-independent.
    Below `driver_threshold` edges, a driver union-find replaces the
    distributed loop (same result, ~10 fewer Spark jobs); above it, the
    checkpointed min-label propagation runs.
    """
    sep = "\x1f"  # unit separator — never appears in normalized ids/types
    spark = sim_edges.sparkSession
    edg = sim_edges.select(
        F.concat_ws(sep, F.col("type"), F.col("a")).alias("a"),
        F.concat_ws(sep, F.col("type"), F.col("b")).alias("b"),
    )

    # limit-probe: ONE job fetches up to threshold+1 edges; if they all fit,
    # that IS the complete edge set and the driver path runs (no separate
    # count() job). Only genuinely huge graphs pay the distributed loop.
    probe = edg.limit(driver_threshold + 1).collect()
    if len(probe) == 0:
        return spark.createDataFrame(
            [], "type string, id string, canonical_id string")
    if len(probe) <= driver_threshold:
        pairs = [(r.a, r.b) for r in probe]
        mapping = driver_union_find(pairs)
        rows = [(k.split(sep, 1)[0], k.split(sep, 1)[1],
                 v.split(sep, 1)[1]) for k, v in mapping.items()]
        return spark.createDataFrame(
            rows, "type string, id string, canonical_id string")

    verts = (edg.select(F.col("a").alias("id"))
             .union(edg.select(F.col("b").alias("id"))).distinct())
    comp = connected_components(verts, edg, max_iterations)
    split_id = F.split(F.col("id"), sep, 2)
    split_comp = F.split(F.col("component"), sep, 2)
    return comp.select(
        split_id.getItem(0).alias("type"),
        split_id.getItem(1).alias("id"),
        split_comp.getItem(1).alias("canonical_id"),
    )
