"""Unigram-surprisal document quality scoring (CCNet-style filter).

Not in the reference; this is the deterministic stand-in for the
perplexity filter every large pretraining pipeline runs (CCNet/LLaMA
filter web text by LM perplexity; the unigram model is its first-order
core). A document full of common words scores low surprisal; gibberish
and boilerplate-stripped residue score high — the score feeds the same
keep/flag decision as `doc_quality`'s heuristics, but grounded in the
corpus' own token distribution.

Integer-exact contract (so a DuckDB oracle can replay it bit-for-bit —
IEEE log2 is NOT exactly rounded at all inputs, so no float logs):

  flog2(x) = floor(log2(x)) computed as len(binary_repr(x)) - 1
             (Spark: length(conv(x, 10, 2)) - 1; DuckDB:
             length(bin(x)) - 1 — both emit the unpadded binary string)
  surprisal(word) = flog2(total_tokens) - flog2(count(word))  [bits]
  doc_units       = sum over the doc's tokens of surprisal(word)
  mean_millibits  = 1000 * doc_units div n_tokens

Two corpus scans: (1) the vocabulary count aggregate (map-side
combinable; the total rides a single unpartitioned window over the
vocab frame, never the corpus), (2) the scoring pass — explode + join
on the word key + per-doc rollup. At 100 TB the vocab head (Zipf: a
few MB covers ~95% of token mass) is broadcast and the long tail
defaults to count 1 (maximal surprisal), making pass 2 shuffle-free;
here the plain shuffle join is the exact baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _flog2(col):
    """floor(log2(col)) via unpadded binary-string length — integer-exact
    and identical across Spark (conv) / DuckDB (bin) / Python
    (int.bit_length)."""
    return (F.length(F.conv(col.cast("string"), 10, 2)) - 1).cast("long")


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c, total_tokens, surprisal_bits) over space-split tokens.
    total_tokens is attached via a window over the VOCAB aggregate
    (≤ |vocab| rows move, never the corpus)."""
    counts = (docs.select(F.explode(F.split(F.col(text_col), " "))
                          .alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count("*").alias("c")))
    total = F.sum("c").over(Window.partitionBy())
    return (counts.withColumn("total_tokens", total)
            .withColumn("surprisal_bits",
                        _flog2(F.col("total_tokens")) - _flog2(F.col("c"))))


def doc_surprisal(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc unigram surprisal: (id, n_tokens, surprisal_units,
    mean_millibits) — all BIGINT, deterministic, engine-portable."""
    vocab = unigram_counts(docs, text_col)
    toks = (docs.select(F.col(id_col).alias("id"),
                        F.explode(F.split(F.col(text_col), " "))
                        .alias("word"))
            .filter(F.col("word") != ""))
    return (toks.join(vocab.select("word", "surprisal_bits"), "word")
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("surprisal_bits").alias("surprisal_units"))
            .withColumn("mean_millibits",
                        F.expr("(1000 * surprisal_units) div n_tokens")))
