"""V1-V4/V6: validation metrics + the confidence gate before sink commit.

Reference semantics (ValidationLayer, code/legal-llm/legal_graphrag.py
:243-315; gate :619-626):
  * V1 citation-format score: fraction of citations matching the legal
    pattern; EMPTY input scores 1.0 (ref :281-283).
  * V2 definition score: fraction with non-empty term and definition text
    longer than 10 chars; empty → 1.0 (ref :296-298).
  * V3 completeness: non-empty entity classes / expected classes (ref
    :309-315).
  * confidence = mean(V1, V2, V3) (ref :267); store ONLY when confidence
    ≥ threshold, default 0.99 (ref :342, :619-626) — below it, the graph
    write is skipped and only metrics land ("recommend human review").

Here the scores are computed over the BUILT graph's node classes (the
engine's post-merge equivalent of the reference's per-document entity
dict), as single JVM aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CONFIDENCE_THRESHOLD = 0.99  # ref legal_graphrag.py:342
EXPECTED_CLASSES = ["Person", "Organization", "Place", "Term", "Section"]


def validation_scores(nodes: DataFrame) -> dict:
    """{citation_format_validity, definition_validity, completeness,
    confidence} over the built graph's node classes — ONE aggregation pass
    (a conditional avg ignores the nulls of other node classes, so each
    score sees only its own class; null avg = empty class = 1.0, the
    reference's empty-list semantics ref :281-283, :296-298)."""
    v1_pred = F.col("id").rlike(r"^§ \d+(\.\d+)*$")
    v2_pred = F.length(F.element_at("properties", "definitionText")) > 10
    row = nodes.agg(
        F.avg(F.when(F.col("type") == "Section",
                     F.when(v1_pred, 1.0).otherwise(0.0))).alias("v1"),
        F.avg(F.when(F.col("type") == "Term",
                     F.when(v2_pred, 1.0).otherwise(0.0))).alias("v2"),
        F.countDistinct(
            F.when(F.col("type").isin(EXPECTED_CLASSES), F.col("type"))
        ).alias("present"),
    ).first()
    v1 = 1.0 if row["v1"] is None else float(row["v1"])
    v2 = 1.0 if row["v2"] is None else float(row["v2"])
    v3 = float(row["present"]) / len(EXPECTED_CLASSES)
    return {
        "citation_format_validity": v1,
        "definition_validity": v2,
        "completeness": v3,
        "confidence": (v1 + v2 + v3) / 3.0,
    }


def validation_report(spark: SparkSession, nodes: DataFrame,
                      edges: DataFrame) -> DataFrame:
    """(metric, value) rows: V1-V3 + confidence + V6 totals."""
    scores = validation_scores(nodes)
    rows = [(k, float(v)) for k, v in sorted(scores.items())]
    rows.append(("edge_total", float(edges.count())))
    rows.append(("node_total", float(nodes.count())))
    return spark.createDataFrame(rows, "metric string, value double") \
        .orderBy("metric")


def reconcile_entities(structured: DataFrame, semantic: DataFrame,
                       key_cols=("type", "id")) -> DataFrame:
    """V5 entity reconciliation (ref _reconcile_entities
    legal_graphrag.py:317-331 + SURVEY §2.5: structured extraction wins
    over semantic on key collisions): unionByName with a `source` tag and
    priority dedup via one window row_number per key — structured rows
    rank first, ties broken deterministically on source name. Unlike the
    reference (which today drops the semantic list wholesale), semantic
    rows SURVIVE when no structured row claims their key — the documented
    intent ('sophisticated deduplication' placeholder) without losing
    recall."""
    from pyspark.sql import Window
    s = structured.withColumn("source", F.lit("structured"))
    m = semantic.withColumn("source", F.lit("semantic"))
    both = s.unionByName(m)
    # final tie-break: duplicate keys WITHIN one source must also pick a
    # deterministic winner — order on the serialized full row (to_json
    # handles map columns that xxhash64 cannot)
    row_key = F.to_json(F.struct(*[F.col(c) for c in both.columns]))
    w = Window.partitionBy(*key_cols).orderBy(
        F.when(F.col("source") == "structured", 0).otherwise(1),
        "source", row_key)
    return (both.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
