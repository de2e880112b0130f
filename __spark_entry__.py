"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine package: ``llm_knowledge_graph_spark`` (see SURVEY.md §7).
Queries with oracles live in plans/driver_queries.py; KG-pipeline
queries (not ANSI-SQL-expressible; fidelity proven against the
plain-Python oracle in tests/) live in plans/kg_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction (chunk → extract → normalize → merge
    → link → canonicalize) over the sf0.001 documents table (each document
    wrapped as a Common-Crawl-style page) UNIONed with the deterministic
    fixture corpus, then top-25 entities by degree."""
    from llm_knowledge_graph_spark.config import PipelineConfig
    from llm_knowledge_graph_spark.plans.pipeline import build_kg
    from llm_knowledge_graph_spark.plans.queries import degree_topk
    from llm_knowledge_graph_spark.sources.pages import (PAGES_SCHEMA,
                                                         synthesize_pages)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    fixture = synthesize_pages(spark, 100, seed=42)
    pages = doc_pages.unionByName(fixture.select(*PAGES_SCHEMA.fieldNames()))
    res = build_kg(spark, pages, PipelineConfig())
    return degree_topk(res.canonical_edges, k=25)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + the
    training-data-pipeline ops (dedup / similarity / text analysis /
    multimodal)."""
    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    from llm_knowledge_graph_spark.plans.kg_queries import KG_QUERIES
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(SQL_QUERIES)
    out.update(KG_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    aliases as the Spark side). KG-pipeline entries are omitted → the
    driver records the weaker rows-only check for those."""
    from llm_knowledge_graph_spark.plans.driver_queries import ORACLE_SQL
    return dict(ORACLE_SQL)
