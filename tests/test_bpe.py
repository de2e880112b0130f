"""BPE merge training (operators/bpe.py) vs a pure-Python replica of
the pinned contract (Python str.replace is the same left-to-right
non-overlapping sweep as Spark's and DuckDB's replace)."""

from __future__ import annotations

import pytest

from collections import Counter

from llm_knowledge_graph_spark.operators.bpe import (bpe_merges,
                                                     word_frequencies)


def _python_bpe(word_freq, n_merges):
    seqs = [(" " + " ".join(w) + " ", f) for w, f in word_freq.items()]
    out = []
    for it in range(1, n_merges + 1):
        counts = Counter()
        for seq, f in seqs:
            sym = seq.strip().split(" ")
            for x, y in zip(sym, sym[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        # (count DESC, left ASC, right ASC)
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((it, a, b, c))
        pat, rep = f" {a} {b} ", f" {a}{b} "
        seqs = [(s.replace(pat, rep).replace(pat, rep), f) for s, f in seqs]
    return out


@pytest.mark.heavy
def test_bpe_merges_match_python_replica(spark):
    wf = {"hello": 2, "hell": 1, "llll": 1, "lo": 3, "中文": 2, "a.b": 1}
    words = spark.createDataFrame(list(wf.items()), "word string, freq long")
    got = [(r.iter, r.left_sym, r.right_sym, r.pair_count)
           for r in bpe_merges(spark, words, 5).orderBy("iter").collect()]
    assert got == _python_bpe(wf, 5)
    # the run-collapse case actually exercised both sweeps: 'llll'
    assert any(l == "l" and r == "l" for _, l, r, _ in got)


@pytest.mark.heavy
def test_word_frequencies_and_full_corpus_merges(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the cat"), (2, "the hat")], "doc_id long, text string")
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"the": 3, "cat": 2, "hat": 1}
    got = [(r.iter, r.left_sym, r.right_sym, r.pair_count)
           for r in bpe_merges(spark, word_frequencies(docs), 3).collect()]
    assert got == _python_bpe(wf, 3)
    # first merge must be the most frequent pair: (a,t) freq 3 vs (t,h) 3
    # vs (h,e) 3 — tie broken ascending: ('a','t')
    assert got[0][1:3] == ("a", "t")


def test_encode_words_applies_merges_in_order(spark):
    from llm_knowledge_graph_spark.operators.bpe import encode_words
    words = spark.createDataFrame(
        [("merger",), ("hello",), ("x",)], "word string")
    # merges learned elsewhere: er, then m+er (uses the er symbol)
    enc = {r.word: (r.n_tokens, r.n_chars) for r in
           encode_words(words, [("e", "r"), ("m", "er")]).collect()}
    assert enc["merger"] == (3, 6)   # mer g er
    assert enc["hello"] == (5, 5)    # untouched
    assert enc["x"] == (1, 1)
    # more merges never increases token count
    enc2 = {r.word: r.n_tokens for r in
            encode_words(words, [("e", "r")]).collect()}
    assert all(enc[w][0] <= enc2[w] for w in enc2)
