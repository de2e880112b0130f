"""ngram_contamination operator fidelity on a planted-overlap corpus
(the driver query `doc_decontamination` is additionally value-verified
against a DuckDB oracle on the real documents table)."""

from __future__ import annotations


def _py_contamination(corpus, benchmark, n):
    def grams(text):
        w = text.split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    bench = {g for _, t in benchmark for g in grams(t)}
    out = {}
    for doc_id, t in corpus:
        gs = grams(t)
        hits = [g for g in gs if g in bench]
        if hits:
            out[doc_id] = (len(hits), len(set(hits)), len(gs))
    return out


def test_ngram_contamination_matches_python_oracle(spark):
    benchmark = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
    ]
    corpus = [
        # verbatim copy of a benchmark span → contaminated
        (10, "intro words then the quick brown fox jumps over the lazy dog and more"),
        # repeated hit: the same benchmark 3-gram appears twice
        (11, "pack my box again pack my box with things"),
        # clean doc
        (12, "completely unrelated sentence about spark partitions"),
        # shorter than n → no shingles, never flagged
        (13, "too short"),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id int, text string")
    bdf = spark.createDataFrame(benchmark, "doc_id int, text string")

    from llm_knowledge_graph_spark.operators.dedup import ngram_contamination
    got = {r.id: (r.n_hits, r.n_distinct_hits, r.n_shingles)
           for r in ngram_contamination(cdf, bdf, n=3).collect()}
    assert got == _py_contamination(corpus, benchmark, 3)
    assert 12 not in got and 13 not in got
    # "pack my box" hits twice, "my box with" once → 3 hits, 2 distinct
    assert got[11][0] == 3 and got[11][1] == 2
