"""Chunking stage (C1/C2 analogue; ref params code/pdf_graphrag.py:811,825).

One Arrow-batched pandas UDF computes all chunks for a page; `explode` turns
them into rows. Chunking is embarrassingly parallel (pure function of
`text`), so this stage has NO shuffle — chunk rows inherit the page
partitioning, which downstream per-chunk extraction also reuses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..reference_impl import CHUNK_OVERLAP, CHUNK_SIZE, chunk_text

_CHUNK_ARR = ("array<struct<chunk_id:long,text:string,"
              "char_start:long,char_end:long>>")


def make_chunk_udf(chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP):
    @pandas_udf("string")
    def chunk_udf(text: pd.Series) -> pd.Series:
        # JSON transfer + JVM-side from_json: python→arrow conversion of
        # array<struct> falls off pyarrow's vectorized path (see extract.py)
        import json
        return text.map(
            lambda t: json.dumps([
                {"chunk_id": cid, "text": ct, "char_start": cs, "char_end": ce}
                for cid, ct, cs, ce in chunk_text(t or "", chunk_size, overlap)
            ], ensure_ascii=False)
        )
    return chunk_udf


def chunk_pages(pages: DataFrame, chunk_size: int = CHUNK_SIZE,
                overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """pages(url, text, ...) → chunks(url, chunk_id, text, char_start, char_end)."""
    chunk_udf = make_chunk_udf(chunk_size, overlap)
    return (
        pages
        .select("url", F.explode(
            F.from_json(chunk_udf(F.col("text")), _CHUNK_ARR)).alias("c"))
        .select(
            "url",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.text").alias("text"),
            F.col("c.char_start").alias("char_start"),
            F.col("c.char_end").alias("char_end"),
        )
    )
