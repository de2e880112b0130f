"""BM25 + RRF (operators/retrieval.py): bit-exactness against a
plain-Python twin of the pinned fixed-point contract, plus the ranking
properties the operators exist for."""

from __future__ import annotations

import pytest

from llm_knowledge_graph_spark.operators.retrieval import (
    BM25_B_MILLI, BM25_K1_MILLI, RRF_K, bm25_scores, rrf_fuse)


def py_bm25(docs: dict[int, str], terms: list[str]) -> dict[int, int]:
    toks = {i: t.split(" ") for i, t in docs.items()}
    lens = {i: len(ws) for i, ws in toks.items()}
    n, sum_len = len(docs), sum(lens.values())
    avglen_milli = (1000 * sum_len) // n
    tf = {(i, w): ws.count(w) for i, ws in toks.items()
          for w in terms if w in ws}
    df = {w: sum(1 for (_, w2) in tf if w2 == w) for w in terms}
    out: dict[int, int] = {}
    for (i, w), t in tf.items():
        ratio_milli = (1000000 * lens[i]) // avglen_milli
        norm_milli = (1000 - BM25_B_MILLI) + (BM25_B_MILLI * ratio_milli) // 1000
        denom_milli = 1000 * t + (BM25_K1_MILLI * norm_milli) // 1000
        part_micro = (t * (1000 + BM25_K1_MILLI) * 1000000) // denom_milli
        idf = max(((2 * n) // (2 * df[w] + 1)).bit_length() - 1, 0)
        out[i] = out.get(i, 0) + idf * part_micro
    return out


DOCS = {
    0: "spark runs a join over the stream of rows",
    1: "vector vector vector search with a tiny index",
    2: "the quick brown fox jumps over the lazy dog",
    3: "spark spark spark spark spark stream stream join",
    4: "a very long document " + "filler word " * 40 + "with one join",
    5: "join stream vector spark all four terms once",
}
# filler docs without any query term: raises N so the floor-log2 idf
# differentiates (at N≈6 every term's idf floors to 0 — the integer-idf
# contract needs term-df ≪ N, like any real corpus)
DOCS.update({i: "plain filler text about nothing in particular"
             for i in range(6, 30)})
TERMS = ["join", "vector", "stream", "spark"]


@pytest.mark.heavy
def test_bm25_matches_python_twin(spark):
    df = spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")
    got = {r.doc_id: r.bm25_micro
           for r in bm25_scores(df, "doc_id", "text", TERMS).collect()}
    assert got == py_bm25(DOCS, TERMS)


@pytest.mark.heavy
def test_bm25_ranking_properties(spark):
    df = spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")
    got = {r.doc_id: r.bm25_micro
           for r in bm25_scores(df, "doc_id", "text", TERMS).collect()}
    # doc 2 matches no term → absent
    assert 2 not in got
    # all-four-terms doc beats the single-term long doc
    assert got[5] > got[4]
    # term repetition saturates: 5x "spark" scores less than 5x the
    # one-occurrence contribution (k1 saturation)
    assert got[3] < 5 * got[0]


def test_rrf_fusion(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank long")
    b = spark.createDataFrame([(3, 1), (4, 2)], "id long, rank long")
    got = {r.id: r.rrf_ppm for r in rrf_fuse(a, b, "id").collect()}
    u = 1000000
    assert got == {
        1: u // (RRF_K + 1),
        2: u // (RRF_K + 2),
        3: u // (RRF_K + 3) + u // (RRF_K + 1),
        4: u // (RRF_K + 2),
    }
    # both-list doc outranks every single-list doc here
    assert got[3] == max(got.values())
