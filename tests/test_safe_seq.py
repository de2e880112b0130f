"""safe_seq regression: n-gram transforms must be TOTAL on short docs.

Round-4 bug: `F.sequence(lit(1), size(toks) - k)` goes DESCENDING when
size(toks) <= k (Spark sequences auto-step -1), so the element_at/slice
calls inside the transform lambda index past the array. The row filter
`size(toks) >= k+1` does NOT protect the expression — Catalyst infers
predicates over the gram expression from downstream operators
(InferFiltersFromGenerate under an explode) and evaluated the transform
inside a codegen'd Filter before the size guard, crashing
ngram_contamination on a 2-token doc at n=3. Every gram builder now
routes through functions.text.safe_seq (ascending-or-empty).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_safe_seq_empty_when_descending(spark):
    from llm_knowledge_graph_spark.functions.text import safe_seq
    df = spark.range(1).select(
        safe_seq(F.lit(0)).alias("empty"),
        safe_seq(F.lit(-3)).alias("neg"),
        safe_seq(F.lit(3)).alias("asc"),
    )
    row = df.collect()[0]
    assert row.empty == [] and row.neg == []
    assert row.asc == [1, 2, 3]


def test_shingle_arrays_safe_on_short_docs(spark):
    from llm_knowledge_graph_spark.operators.dedup import _word_shingle_arrays
    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c d")], "doc_id int, text string")
    # explode downstream reproduces the InferFiltersFromGenerate shape
    got = (_word_shingle_arrays(df, 3, "doc_id", "text")
           .select("id", F.explode("gs").alias("g"))
           .groupBy("id").count().collect())
    assert {r.id: r["count"] for r in got} == {3: 2}


def test_word_edges_safe_on_single_word_doc(spark, tmp_path):
    # the _word_edges / word_cooccurrence builder shape: bigram structs
    # + explode after a size>=2 filter, over a corpus with a 1-word doc
    from llm_knowledge_graph_spark.functions.text import safe_seq
    df = spark.createDataFrame(
        [(1, "solo"), (2, "x y z")], "doc_id int, text string")
    toks = F.split(F.col("text"), " ")
    pairs = F.transform(
        safe_seq(F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("a"),
                           F.element_at(toks, i + 1).alias("b")))
    out = (df.filter(F.size(toks) >= 2)
           .select(F.explode(pairs).alias("p"))
           .select("p.a", "p.b").collect())
    assert sorted((r.a, r.b) for r in out) == [("x", "y"), ("y", "z")]


@pytest.mark.heavy
def test_shingle_arrays_match_python_grams_randomized(spark):
    """Exhaustive-ish fidelity: _word_shingle_arrays == Python slice
    grams over a seeded random corpus spanning 0..12 tokens (below,
    at, and above every n), unicode tokens, and within-doc repeats —
    one Spark job per n, not per example."""
    import random

    from llm_knowledge_graph_spark.operators.dedup import _word_shingle_arrays

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "éé", "中文", "z9"]
    corpus = [(i, " ".join(rng.choice(vocab)
                           for _ in range(rng.randrange(0, 13))))
              for i in range(120)]
    df = spark.createDataFrame(corpus, "doc_id int, text string")

    def py_grams(text, n):
        w = text.split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    for n in (2, 3, 5, 8):
        got = {r.id: r.gs for r in
               _word_shingle_arrays(df, n, "doc_id", "text").collect()}
        exp = {i: py_grams(t, n) for i, t in corpus
               if len(t.split(" ")) >= n}
        assert got == exp, f"n={n}"
        got_d = {r.id: r.gs for r in
                 _word_shingle_arrays(df, n, "doc_id", "text",
                                      distinct=True).collect()}
        exp_d = {i: list(dict.fromkeys(v)) for i, v in exp.items()}
        assert got_d == exp_d, f"distinct n={n}"


def test_bpe_pair_counts_safe_on_single_symbol(spark):
    from llm_knowledge_graph_spark.operators.bpe import _pair_counts
    seqs = spark.createDataFrame(
        [("a", 5), ("a b", 2)], "seq string, freq long")
    got = {(r.a, r.b): r.pair_count for r in _pair_counts(seqs).collect()}
    assert got == {("a", "b"): 2}
