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


def _score_or_one(df: DataFrame, pred) -> float:
    """avg(pred) over df, 1.0 when df is empty (ref empty-list semantics)."""
    row = df.agg(F.avg(F.when(pred, 1.0).otherwise(0.0)).alias("s")).first()
    return 1.0 if row["s"] is None else float(row["s"])


def validation_scores(nodes: DataFrame) -> dict:
    """{citation_format_validity, definition_validity, completeness,
    confidence} over the built graph's node classes."""
    v1 = _score_or_one(
        nodes.filter(F.col("type") == "Section"),
        F.col("id").rlike(r"^§ \d+(\.\d+)*$"))
    v2 = _score_or_one(
        nodes.filter(F.col("type") == "Term"),
        F.length(F.element_at("properties", "definitionText")) > 10)
    present = (nodes.filter(F.col("type").isin(EXPECTED_CLASSES))
               .select("type").distinct().count())
    v3 = float(present) / len(EXPECTED_CLASSES)
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
    w = Window.partitionBy(*key_cols).orderBy(
        F.when(F.col("source") == "structured", 0).otherwise(1), "source")
    return (both.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
