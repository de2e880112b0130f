"""remove_duplicate_spans fidelity: first-witness keeps, later
occurrences removed, overlap semantics, and the plain-Python oracle on
a randomized corpus. The driver query `doc_dup_span_removal` is
additionally value-verified against a DuckDB oracle on the real
documents table."""

from __future__ import annotations

import pytest

import hashlib


def _py_remove_spans(corpus, n):
    occ = []  # (gram, doc_id, pos) in (doc, pos) order
    toks = {i: t.split(" ") for i, t in corpus}
    for i, _ in corpus:
        w = toks[i]
        for p in range(len(w) - n + 1):
            occ.append((" ".join(w[p:p + n]), i, p + 1))
    from collections import defaultdict
    by_g = defaultdict(list)
    for g, i, p in occ:
        by_g[g].append((i, p))
    removed = defaultdict(set)
    for g, occs in by_g.items():
        if len(occs) < 2:
            continue
        w_id, w_pos = min(occs)
        for i, p in occs:
            if (i, p) != (w_id, w_pos):
                removed[i].update(range(p, p + n))
    out = {}
    for i, _ in corpus:
        w = toks[i]
        kept = [t for j, t in enumerate(w, start=1)
                if j not in removed[i]]
        out[i] = (len(w), len(removed[i]),
                  hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


def _got(spark, corpus, n):
    from llm_knowledge_graph_spark.operators.dedup import (
        remove_duplicate_spans)
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    return {r.id: (r.n_tokens, r.n_removed, r.clean_md5)
            for r in remove_duplicate_spans(df, n=n).collect()}


def test_span_removal_planted(spark):
    corpus = [
        # doc 1 is the first witness of the shared 3-gram "a b c"
        (1, "a b c x y"),
        # later doc: the shared gram occurs → its 3 tokens removed
        (2, "p q a b c r"),
        # within-doc repeat: first occurrence keeps, second removed
        (3, "k l m z z k l m"),
        # clean doc, and a doc shorter than n
        (4, "unique words only here"),
        (5, "hi"),
    ]
    got = _got(spark, corpus, 3)
    exp = _py_remove_spans(corpus, 3)
    assert got == exp
    # spot-assert the semantics, not just oracle equality:
    assert got[1][1] == 0                       # first witness untouched
    assert got[2] == (6, 3,
                      _py_remove_spans(corpus, 3)[2][2])
    assert got[3][1] == 3                       # second "k l m" removed
    assert got[4][1] == 0 and got[5][1] == 0


def test_span_removal_overlap_covers_first_witness_tokens(spark):
    # "a b a b a b": grams (pos1 "a b a", pos2 "b a b", pos3 "a b a",
    # pos4 "b a b") — every within-doc duplicated occurrence past its
    # witness removes its covered tokens, INCLUDING tokens the witness
    # occurrence shares with it (the documented n-gram-marking
    # contract).
    corpus = [(1, "a b a b a b")]
    got = _got(spark, corpus, 3)
    assert got == _py_remove_spans(corpus, 3)
    # pos3 and pos4 are removed → positions 3..6 gone, tokens 1-2 stay
    assert got[1] == (6, 4,
                      hashlib.md5(b"a b").hexdigest())


@pytest.mark.heavy
def test_span_removal_matches_python_randomized(spark):
    import random
    rng = random.Random(11)
    vocab = ["a", "b", "c", "d", "e"]
    corpus = [(i, " ".join(rng.choice(vocab)
                           for _ in range(rng.randrange(0, 16))))
              for i in range(80)]
    for n in (2, 4, 8):
        assert _got(spark, corpus, n) == _py_remove_spans(corpus, n), n


@pytest.mark.heavy
def test_span_removal_except_equals_scan_twin_worst_case(spark):
    """Round-5 de-quadratic fix: the default array_except/element_at
    reconstruction must be bit-identical to the original O(L*R)
    array_contains scan (kept as the independently-planned twin) on the
    worst case — a corpus where almost every token of every doc is
    removed (40 copies of the same long doc + partial overlaps), plus
    edge docs (shorter than n, empty-ish, within-doc repeats)."""
    from llm_knowledge_graph_spark.operators.dedup import (
        remove_duplicate_spans)
    body = " ".join(f"w{i % 37}" for i in range(400))
    corpus = [(i, body) for i in range(40)]                 # 40x duplicated
    corpus += [(100 + i, body[: len(body) // 2] + f" uniq{i}")
               for i in range(5)]                            # half-overlap
    corpus += [(200, "a b"), (201, "k l m z z k l m"),
               (202, "unique words only appearing here once")]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    for n in (3, 8):
        got = {r.id: (r.n_tokens, r.n_removed, r.clean_md5)
               for r in remove_duplicate_spans(
                   df, n=n, reconstruct="except").collect()}
        twin = {r.id: (r.n_tokens, r.n_removed, r.clean_md5)
                for r in remove_duplicate_spans(
                    df, n=n, reconstruct="scan").collect()}
        assert got == twin, n
    # the fully-duplicated copies really do lose everything past the
    # first witness (sanity that the worst case is exercised)
    assert got[1][1] == got[1][0]
    # oracle equality on the default path too
    assert {i: got[i] for i in (200, 201, 202)} == {
        i: _py_remove_spans(corpus, 8)[i] for i in (200, 201, 202)}
