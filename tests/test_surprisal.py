"""Unigram surprisal scoring (operators/surprisal.py) vs a plain-Python
twin of the integer floor-log2 contract, plus ranking sanity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _py_doc_surprisal(docs):
    """Plain-Python twin: docs = [(id, text)]."""
    counts = Counter(w for _, t in docs for w in t.split(" ") if w)
    total = sum(counts.values())

    def flog2(x):
        return x.bit_length() - 1

    out = {}
    for did, t in docs:
        toks = [w for w in t.split(" ") if w]
        units = sum(flog2(total) - flog2(counts[w]) for w in toks)
        out[did] = (len(toks), units, 1000 * units // len(toks))
    return out


def test_doc_surprisal_matches_python_oracle(spark):
    from llm_knowledge_graph_spark.operators.surprisal import doc_surprisal
    rows = [(r.doc_id, r.text) for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 40)
            .select("doc_id", "text").collect()]
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 40))
    got = {r.id: (r.n_tokens, r.surprisal_units, r.mean_millibits)
           for r in doc_surprisal(docs).collect()}
    assert got == _py_doc_surprisal(rows)


def test_flog2_is_exact_at_powers_of_two(spark):
    """The reason for the binary-string trick: IEEE log2 is not exactly
    rounded everywhere, but len(bin(x))-1 is exact by construction —
    pinned at every power of two and its neighbors up to 2^62."""
    from llm_knowledge_graph_spark.operators.surprisal import _flog2
    vals = []
    for e in range(1, 63):
        vals += [(1 << e) - 1, 1 << e, (1 << e) + 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.f for r in
           df.select("x", _flog2(F.col("x")).alias("f")).collect()}
    for v in vals:
        assert got[v] == v.bit_length() - 1, v


def test_surprisal_ranks_rare_above_common(spark):
    """A doc of corpus-unique words must out-score a doc repeating the
    corpus' most common pattern — the property the quality filter uses."""
    from llm_knowledge_graph_spark.operators.surprisal import doc_surprisal
    rows = [(1, "the the the the the the the the"),
            (2, "the the the the qzx wvu ponm lkj")] + \
           [(i, "the common words appear here") for i in range(3, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.mean_millibits for r in doc_surprisal(docs).collect()}
    assert got[2] > got[1]  # rare tokens raise mean surprisal
    # singleton words carry the maximal per-token surprisal
    assert got[2] > got[3]
