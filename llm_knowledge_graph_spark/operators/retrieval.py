"""Lexical retrieval (BM25) and hybrid rank fusion (RRF) — the keyword
half of the reference's hybrid RAG read path.

The reference answers questions by fusing graph traversal with vector
similarity (code/pdf_graphrag.py invoke_question: Cypher candidates +
embedding top-k). A production retrieval stack adds a LEXICAL ranker
and fuses the lists; these operators supply both, under the engine's
integer-exactness discipline so DuckDB value-hash-verifies them:

* **BM25** — pinned fixed-point contract: k1=1.2 / b=0.75 carried as
  milli-integers, every division an integer floor `div`, and idf the
  portable floor-log2 (Spark ``conv``, DuckDB ``bin``, Python
  ``bit_length`` — the same primitive as operators/surprisal.py) of
  the odds ratio 2N/(2·df+1), clamped at 0. Scores are exact BIGINT
  micro-units — bit-identical across engines by construction.
* **RRF** (reciprocal rank fusion, Cormack et al.) — fuse any two
  rankings as Σ 1e6 div (60 + rank): pure integer, insensitive to
  score scales, the standard lexical+vector fusion.

Scale shape: tf/df/len are all map-side-combinable hash aggregates
over the token stream; the (term → df/idf) table is ≤|query| rows and
broadcasts; the corpus-wide N/avglen totals are ONE 1-row aggregate
cross-joined as a broadcast literal (the temperature-weights pattern).
Nothing shuffles on anything bigger than (doc_id) — and the per-doc
score table is |matching docs| rows, top-k'd via TakeOrderedAndProject.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

BM25_K1_MILLI = 1200
BM25_B_MILLI = 750
RRF_K = 60


# One shared floor-log2 primitive — a second copy here would be a
# divergence hazard (a guard added to one silently missing the other).
from .surprisal import _flog2  # noqa: E402


def bm25_scores(docs: DataFrame, id_col: str, text_col: str,
                terms: Sequence[str]) -> DataFrame:
    """Exact-integer BM25 over whitespace tokens. Returns
    ``(id_col, bm25_micro:bigint)`` for every document matching at
    least one query term (others score 0 and are omitted).

    Pinned arithmetic (the DuckDB oracle replays it verbatim):
      avglen_milli = (1000 * Σ len) div N
      ratio_milli  = (1000000 * len) div avglen_milli
      norm_milli   = (1000 - b_milli) + (b_milli * ratio_milli) div 1000
      denom_milli  = 1000*tf + (k1_milli * norm_milli) div 1000
      part_micro   = (tf * (1000 + k1_milli) * 1000000) div denom_milli
      idf_units    = max(floor_log2((2N) div (2*df + 1)), 0)
      bm25_micro   = Σ_terms idf_units * part_micro
    """
    toks = docs.select(id_col, F.explode(F.split(F.col(text_col), " "))
                       .alias("w"))
    lens = toks.groupBy(id_col).agg(F.count("*").alias("len"))
    stats = lens.agg(F.count("*").alias("n_docs"),
                     F.sum("len").alias("sum_len"))
    tf = (toks.filter(F.col("w").isin(list(terms)))
          .groupBy(id_col, "w").agg(F.count("*").alias("tf")))
    df_t = tf.groupBy("w").agg(F.count("*").alias("df"))

    scored = (tf
              .join(F.broadcast(df_t), "w")
              .join(lens, id_col)
              .crossJoin(F.broadcast(stats)))
    scored = (scored
              .withColumn("avglen_milli",
                          F.expr("(1000 * sum_len) div n_docs"))
              .withColumn("ratio_milli",
                          F.expr("(1000000 * len) div avglen_milli"))
              .withColumn("norm_milli",
                          F.expr(f"(1000 - {BM25_B_MILLI}) + "
                                 f"({BM25_B_MILLI} * ratio_milli) div 1000"))
              .withColumn("denom_milli",
                          F.expr(f"1000 * tf + "
                                 f"({BM25_K1_MILLI} * norm_milli) div 1000"))
              .withColumn("part_micro",
                          F.expr(f"(tf * {1000 + BM25_K1_MILLI} * 1000000) "
                                 f"div denom_milli"))
              .withColumn("idf_units",
                          F.greatest(
                              _flog2(F.expr("(2 * n_docs) div (2 * df + 1)")),
                              F.lit(0).cast("long"))))
    return (scored
            .groupBy(id_col)
            .agg(F.sum(F.col("idf_units") * F.col("part_micro"))
                 .alias("bm25_micro")))


def bm25_oracle_sql(docs_rel: str, id_col: str, text_col: str,
                    terms: Sequence[str]) -> str:
    """DuckDB twin of :func:`bm25_scores` (same names, same arithmetic).
    Yields (id_col, bm25_micro)."""
    in_list = ", ".join("'%s'" % t.replace("'", "''") for t in terms)
    return f"""
    toks AS (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS w
             FROM {docs_rel}),
    lens AS (SELECT {id_col}, COUNT(*) AS len FROM toks GROUP BY {id_col}),
    stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS sum_len
              FROM lens),
    tf AS (SELECT {id_col}, w, COUNT(*) AS tf FROM toks
           WHERE w IN ({in_list}) GROUP BY {id_col}, w),
    dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    parts AS (
        SELECT tf.{id_col},
               GREATEST(length(bin((2 * n_docs) // (2 * df + 1))) - 1, 0)
                 AS idf_units,
               (tf * {1000 + BM25_K1_MILLI} * 1000000) // (
                   1000 * tf + ({BM25_K1_MILLI} * (
                       (1000 - {BM25_B_MILLI})
                       + ({BM25_B_MILLI} *
                          ((1000000 * len) // ((1000 * sum_len) // n_docs)))
                         // 1000)) // 1000) AS part_micro
        FROM tf JOIN dft ON tf.w = dft.w
        JOIN lens ON tf.{id_col} = lens.{id_col}
        CROSS JOIN stats),
    bm25 AS (SELECT {id_col},
                    CAST(SUM(idf_units * part_micro) AS BIGINT)
                      AS bm25_micro
             FROM parts GROUP BY {id_col})
    """


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame,
             id_col: str) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) lists:
    rrf_ppm = Σ_lists 1e6 div (RRF_K + rank), absent list → 0.
    Pure integer; returns (id_col, rrf_ppm)."""
    a = ranked_a.select(id_col, F.col("rank").alias("rank_a"))
    b = ranked_b.select(id_col, F.col("rank").alias("rank_b"))
    fused = a.join(b, id_col, "full_outer")
    ppm = (F.coalesce(F.expr(f"1000000 div ({RRF_K} + rank_a)"), F.lit(0))
           + F.coalesce(F.expr(f"1000000 div ({RRF_K} + rank_b)"), F.lit(0)))
    return fused.select(id_col, ppm.cast("long").alias("rrf_ppm"))
