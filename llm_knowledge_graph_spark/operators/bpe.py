"""BPE-style tokenizer merge training over the corpus vocabulary.

Not in the reference (it never trains a tokenizer); this is the
vocabulary-construction op a training-data pipeline runs before
packing. Classic byte-pair encoding: start from characters, repeatedly
merge the most frequent adjacent symbol pair. The merge CONTRACT here
is pinned so a SQL oracle can replay it bit-for-bit:

* words are space-split tokens weighted by corpus frequency; a word's
  symbol sequence is its characters joined by single spaces with one
  boundary space on each side;
* pair counts are corpus-frequency-weighted adjacent symbol pairs;
  the winning pair is (count DESC, left ASC, right ASC) — total order,
  so ties are deterministic;
* applying a merge = TWO left-to-right non-overlapping literal
  ``replace(seq, ' a b ', ' ab ')`` sweeps (one sweep misses every
  second occurrence in a run like ``a b a b`` because the match
  consumes the shared space; the second sweep halves the remainder —
  both engines implement identical replace semantics, verified for
  ASCII, regex metacharacters, and CJK).

Scale shape (100 TB): the corpus is scanned ONCE to build the word
frequency table (map-side-combinable); every merge iteration then runs
over the VOCABULARY (≪ corpus), as one partial+final pair-count
aggregate plus a driver-side 1-row argmax (a bounded collect, like the
components limit-probe). n_merges iterations = n small vocab jobs —
the standard distributed-BPE layout (Hugging Face tokenizers shards
the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over space-split tokens, empties dropped."""
    return (docs.select(F.explode(F.split(F.col(text_col), " "))
                        .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    from ..functions.text import safe_seq
    sym = F.split(F.trim(F.col("seq")), " ")
    pairs = F.transform(
        safe_seq(F.size(sym) - 1),
        lambda i: F.struct(F.element_at(sym, i).alias("a"),
                           F.element_at(sym, i + 1).alias("b")))
    return (seqs.filter(F.size(sym) >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pair_count")))


def bpe_merges(spark: SparkSession, words: DataFrame,
               n_merges: int) -> DataFrame:
    """Run ``n_merges`` BPE merge iterations over a (word, freq) table;
    returns (iter, left_sym, right_sym, pair_count) — the learned merge
    table in training order."""
    seqs = words.select(
        F.concat(F.lit(" "),
                 F.concat_ws(" ", F.split(F.col("word"), "")),
                 F.lit(" ")).alias("seq"),
        "freq").localCheckpoint(eager=False)
    merges = []
    for it in range(1, n_merges + 1):
        top = (_pair_counts(seqs)
               .orderBy(F.desc("pair_count"), "a", "b")
               .limit(1).collect())
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["pair_count"]
        merges.append((it, a, b, int(c)))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        merged = F.replace(F.replace(F.col("seq"), F.lit(pat), F.lit(rep)),
                           F.lit(pat), F.lit(rep))
        seqs = (seqs.select(merged.alias("seq"), "freq")
                .localCheckpoint(eager=False))
    return spark.createDataFrame(
        merges, "iter int, left_sym string, right_sym string, "
                "pair_count long")


def encode_words(words: DataFrame, merges: list,
                 word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to a vocabulary: adds ``n_tokens``
    (symbols after all merges, in training order, same two-sweep
    contract) and ``n_chars``. A pure projection over the vocab — at
    scale this runs once per DISTINCT word, never per occurrence, and
    the merge list itself is driver-side tiny (one row per merge)."""
    seq = F.concat(F.lit(" "),
                   F.concat_ws(" ", F.split(F.col(word_col), "")),
                   F.lit(" "))
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        seq = F.replace(F.replace(seq, pat, rep), pat, rep)
    return words.withColumn(
        "n_tokens", F.size(F.split(F.trim(seq), " ")).cast("long")
    ).withColumn("n_chars", F.length(F.col(word_col)).cast("long"))
