"""C4/K4: chunk embedding as a TYPED vector table.

The reference embeds each chunk with one synchronous API call
(ref code/pdf_graphrag.py:408, model :193) and stores the vector inside the
chunk node's property map; its vector indexes are Neo4jVector stores
(ref :245-269). Engine equivalents:

  * embedding = one Arrow-batched pandas UDF over chunk text (the north
    rule's batched-UDF shape; the deterministic reference_impl.embed_text
    stands in for the ONNX encoder — swapping in a real model is a
    module-level session cache inside the same UDF).
  * the K4 vector-index sink = a typed `embeddings(url, chunk_id,
    embedding array<float>)` table, partitioned like the graph tables.
    Serving cosine queries from a typed array column is a pure JVM
    expression scan (functions/vectors.py); the round-1 design (comma-
    joined string inside the props map) needed split+cast per row and is
    retired as the serving path.

Scale shape: embedding is chunk-local (no shuffle); the table write
shuffles once on the url-hash bucket, pruning per-document reads.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..reference_impl import EMBEDDING_DIM


def make_embed_udf(dim: int = EMBEDDING_DIM):
    @pandas_udf("array<float>")
    def embed_udf(text: pd.Series) -> pd.Series:
        from ..reference_impl import embed_text
        return text.map(lambda t: embed_text(t or "", dim))
    return embed_udf


def chunk_embeddings(chunks: DataFrame, dim: int = EMBEDDING_DIM) -> DataFrame:
    """chunks(url, chunk_id, text) → (url, chunk_id, embedding array<float>).
    Lazy — embedding cost is only paid when a consumer materializes it."""
    udf = make_embed_udf(dim)
    return chunks.select(
        "url", "chunk_id", udf(F.col("text")).alias("embedding"))


def write_embeddings(embeddings: DataFrame, out_dir: str,
                     n_buckets: int = 32, fmt: str = "parquet") -> None:
    """{out_dir}/embeddings partitioned by url-hash bucket (per-document
    lookups prune to one bucket, mirroring the nodes/edges layout)."""
    (embeddings
     .withColumn("url_bucket",
                 F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"))
     .repartition(n_buckets, F.col("url_bucket"))
     .write.mode("overwrite").partitionBy("url_bucket")
     .format(fmt).save(f"{out_dir}/embeddings"))


def read_embeddings(spark, out_dir: str, fmt: str = "parquet") -> DataFrame:
    return (spark.read.format(fmt).load(f"{out_dir}/embeddings")
            .select("url", "chunk_id", "embedding"))


def node_embeddings(nodes: DataFrame, dim: int = EMBEDDING_DIM) -> DataFrame:
    """K4 node-index analogue (ref Neo4jVector for nodes,
    code/pdf_graphrag.py:861-889 — present but disabled in the live path):
    embed each canonical entity NAME → (type, id, embedding). Entity names
    are the merged distinct set (≪ corpus), so this is a tiny scan."""
    udf = make_embed_udf(dim)
    return (nodes.filter(F.col("type") != "Chunk")
            .select("type", "id", udf(F.col("id")).alias("embedding")))


def relationship_embeddings(edges: DataFrame,
                            dim: int = EMBEDDING_DIM) -> DataFrame:
    """K4 relationship-index analogue (ref :861-889): embed the verbalized
    triple 'subj pred obj' → one vector per distinct relationship."""
    udf = make_embed_udf(dim)
    verbalized = F.concat_ws(" ", F.col("subj"), F.col("pred"), F.col("obj"))
    return (edges.filter(F.col("pred") != "HAS")
            .select("subj", "pred", "obj", verbalized.alias("text"))
            .dropDuplicates(["subj", "pred", "obj"])
            .select("subj", "pred", "obj",
                    udf(F.col("text")).alias("embedding")))


def entity_cosine_topk(node_embs: DataFrame, query_vec,
                       k: int = 5) -> DataFrame:
    """Q3 analogue over the node index (ref query_vector_database
    code/pdf_graphrag.py:1056-1078): rank-only top-k entities."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = node_embs.select(
        "type", "id",
        F.round(cosine(F.col("embedding"), q), 4).alias("score"))
    w = Window.orderBy(F.desc("score"), "type", "id")
    return (scored.orderBy(F.desc("score"), "type", "id").limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "type", "id"))


def chunk_cosine_topk(embeddings: DataFrame, query_vec, k: int = 5) -> DataFrame:
    """Q4 analogue over the typed table: top-k chunks by cosine to a query
    vector (ref query_chunks_by_similarity code/pdf_graphrag.py:1082-1104).
    Pure JVM expression scan + top-k; deterministic (url, chunk_id)
    tie-break; rank-only output for cross-engine float stability."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        "url", "chunk_id",
        F.round(cosine(F.col("embedding"), q), 4).alias("score"))
    w = Window.orderBy(F.desc("score"), "url", "chunk_id")
    return (scored.orderBy(F.desc("score"), "url", "chunk_id").limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "url", "chunk_id"))
