"""Stupid Backoff bigram LM scoring fidelity (Brants et al. 2007
semantics at integer floor-log2 granularity) — all three branches (seen
bigram / unigram backoff / OOV) against a plain-Python oracle, plus a
randomized sweep. The driver query `doc_backoff_lm` is additionally
value-verified against a DuckDB oracle on the real documents table."""

from __future__ import annotations

import pytest

ALPHA_BITS = 1


def _flog2(x):
    return x.bit_length() - 1


def _py_backoff(train, score):
    from collections import Counter
    uni = Counter()
    bi = Counter()
    for _, t in train:
        w = [x for x in t.split(" ") if x]      # ONE tokenization rule:
        uni.update(w)                           # empties dropped, then
        bi.update(zip(w, w[1:]))                # adjacent survivors pair
    n = max(sum(uni.values()), 1)               # empty train: N pinned 1
    out = {}
    for i, t in score:
        ws = [x for x in t.split(" ") if x]
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        bits = nb = noov = 0
        for a, b in pairs:
            if (a, b) in bi:
                bits += _flog2(uni[a]) - _flog2(bi[(a, b)])
            elif b in uni:
                nb += 1
                bits += ALPHA_BITS + _flog2(n) - _flog2(uni[b])
            else:
                noov += 1
                bits += ALPHA_BITS + _flog2(n) + 1
        out[i] = (len(pairs), nb, noov, bits,
                  (1000 * bits) // len(pairs))
    return out


def _got(spark, train, score):
    from llm_knowledge_graph_spark.operators.surprisal import (
        stupid_backoff_bits)
    tdf = spark.createDataFrame(train, "doc_id int, text string")
    sdf = spark.createDataFrame(score, "doc_id int, text string")
    return {r.id: (r.n_bigrams, r.n_backoff, r.n_oov, r.bits_units,
                   r.mean_millibits)
            for r in stupid_backoff_bits(tdf, sdf).collect()}


def test_backoff_three_branches(spark):
    train = [
        (0, "the cat sat on the mat"),
        (2, "the cat ran on grass"),
    ]
    score = [
        (1, "the cat sat"),          # both bigrams seen
        (3, "mat the cat"),          # "mat the" unseen, "the" seen → backoff
        (5, "the zebra sat"),        # zebra OOV both directions
        (7, "solo"),                 # < 2 tokens: no row
    ]
    got = _got(spark, train, score)
    exp = _py_backoff(train, score)
    assert got == exp
    assert 7 not in got
    assert got[1][1] == 0 and got[1][2] == 0      # all seen
    assert got[3][1] >= 1                         # backoff fired
    assert got[5][2] >= 1                         # oov fired


@pytest.mark.heavy
def test_backoff_empty_tokens_and_empty_train(spark):
    # consecutive spaces: both engines must pair the SAME survivor
    # sequence (review finding: an empty token present in the bigram
    # stream but absent from the unigram counts silently misclassified
    # seen bigrams as OOV through null lookups)
    train = [(0, "a  b a b")]
    score = [(1, "a  b"), (3, "  ")]
    got = _got(spark, train, score)
    exp = _py_backoff(train, score)
    assert got == exp
    assert got[1] == (1, 0, 0, exp[1][3], exp[1][4])   # seen bigram
    assert 3 not in got                                # no survivors
    # empty train: every event is OOV at ALPHA_BITS + flog2(1) + 1 = 2,
    # all-BIGINT (no null scores)
    got0 = _got(spark, [], [(1, "x y z")])
    assert got0 == {1: (2, 0, 2, 4, 2000)} == _py_backoff([], [(1, "x y z")])


@pytest.mark.heavy
def test_backoff_matches_python_randomized(spark):
    import random
    rng = random.Random(23)
    vocab = ["a", "b", "c", "d", "e", "f", "g"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 14))))
            for i in range(90)]
    train = [d for d in docs if d[0] % 2 == 0]
    score = [d for d in docs if d[0] % 2 == 1]
    assert _got(spark, train, score) == _py_backoff(train, score)


def _got_bcast(spark, train, score, head_k):
    from llm_knowledge_graph_spark.operators.surprisal import (
        stupid_backoff_bits_head_broadcast)
    tdf = spark.createDataFrame(train, "doc_id int, text string")
    sdf = spark.createDataFrame(score, "doc_id int, text string")
    return {r.id: (r.n_bigrams, r.n_backoff, r.n_oov, r.bits_units,
                   r.mean_millibits)
            for r in stupid_backoff_bits_head_broadcast(
                tdf, sdf, head_k=head_k).collect()}


@pytest.mark.heavy
def test_backoff_head_broadcast_equals_plain(spark):
    """Round-5 Zipf-head-broadcast variant: bit-identical to the plain
    three-join form with head_k SMALL (3) so every lookup exercises both
    the broadcast-head hit path and the tail-join miss path, and with
    head_k huge (everything in the head, empty tails)."""
    import random
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    # Zipf-ish skew so a top-3 head really covers most mass
    def doc():
        return " ".join(
            vocab[min(int(rng.expovariate(0.35)), len(vocab) - 1)]
            for _ in range(rng.randrange(0, 30)))
    train = [(i, doc()) for i in range(60)]
    score = [(100 + i, doc() + " zqx unseen") for i in range(40)]
    exp = _py_backoff(train, score)
    for head_k in (3, 10 ** 6):
        assert _got_bcast(spark, train, score, head_k) == exp, head_k


@pytest.mark.heavy
def test_backoff_head_broadcast_empty_train(spark):
    train = [(1, "")]
    score = [(2, "a b c")]
    assert _got_bcast(spark, train, score, 8) == _py_backoff(train, score)


@pytest.mark.heavy
def test_backoff_head_broadcast_plan_uses_broadcast_joins(spark):
    """The head joins must be BroadcastHashJoins (the claim the variant
    exists to evidence); the tail joins remain shuffle joins when the
    head doesn't cover the vocab."""
    from llm_knowledge_graph_spark.operators.surprisal import (
        stupid_backoff_bits_head_broadcast)
    train = spark.createDataFrame(
        [(i, "a b c d e f g h " + f"rare{i} tail{i}") for i in range(20)],
        "doc_id int, text string")
    score = spark.createDataFrame(
        [(100, "a b c rare3 zz"), (101, "e f g h tail7")],
        "doc_id int, text string")
    out = stupid_backoff_bits_head_broadcast(train, score, head_k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
