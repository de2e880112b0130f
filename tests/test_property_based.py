"""Property-based tests (hypothesis) for the deterministic core.

The reference has no property tests (SURVEY §5); these pin the invariants
the whole engine leans on: bit-exact Python string semantics in the
normalizers, chunker coverage/boundary guarantees, encoder determinism,
and MinHash's Jaccard-estimation contract. All driver-side (no Spark) —
the Spark operators call these exact functions through Arrow UDFs, and
Spark-vs-oracle equality is covered by the fidelity suite.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

TEXTY = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200)
# word lengths INCLUDE over-chunk-size tokens (up to 400 chars vs the
# 32-256 chunk sizes below): crawl data carries 1 KB+ URLs/base64 runs,
# and the round-2 chunker bug (mid-word forward snap skipping unseen
# text) only manifests on words longer than chunk_size
WORDS = st.lists(
    st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=400),
    min_size=1, max_size=60)


@given(TEXTY)
@settings(max_examples=200, deadline=None)
def test_format_property_key_matches_python_semantics(s):
    from llm_knowledge_graph_spark.reference_impl import format_property_key
    out = format_property_key(s)
    words = s.split()
    if not words:
        assert out == s
    else:
        assert out == "".join(
            [words[0].lower()] + [w.capitalize() for w in words[1:]])


@given(TEXTY)
@settings(max_examples=200, deadline=None)
def test_format_node_type_default_and_capitalize(s):
    from llm_knowledge_graph_spark.reference_impl import format_node_type
    out = format_node_type(s)
    if not s or not s.strip():
        assert out == "Entity"
    else:
        assert out == s.strip().capitalize()  # NOT initcap: tail lowered


@given(TEXTY)
@settings(max_examples=200, deadline=None)
def test_format_relationship_type_upper_snake(s):
    from llm_knowledge_graph_spark.reference_impl import (
        format_relationship_type)
    out = format_relationship_type(s)
    if not s:
        assert out == "RELATED_TO"
    else:
        assert out == s.strip().replace(" ", "_").upper()
        assert " " not in out


@given(WORDS, st.integers(min_value=32, max_value=256),
       st.integers(min_value=0, max_value=31))
@settings(max_examples=100, deadline=None)
def test_chunker_invariants(words, size, overlap):
    """Coverage (every non-space char appears), bounded chunk length, no
    mid-word splits, monotonically advancing spans, deterministic."""
    from llm_knowledge_graph_spark.reference_impl import chunk_text
    text = " ".join(words)
    chunks = chunk_text(text, size, overlap)
    assert chunks == chunk_text(text, size, overlap)
    if not text.strip():
        assert chunks == []
        return
    # every chunk is a stripped substring within its span and ≤ size chars
    prev_start = -1
    word_set = set(text.split(" "))
    for cid, ctext, cs, ce in chunks:
        assert 0 <= cs < ce <= len(text)
        assert ctext == text[cs:ce].strip()
        assert len(ctext) <= size
        assert cs > prev_start  # strictly advancing starts
        prev_start = cs
        # word-boundary guarantee: chunk edges never split a word, EXCEPT
        # inside a single word longer than chunk_size (the documented
        # hard-character-cut fallback for over-length words). Review
        # finding (round 3): the old form was tautological (`w in text`
        # is true for any substring); this one fails on a mid-word split
        # of any normal-length word.
        for w in ctext.split(" "):
            assert (not w or w in word_set
                    or any(len(orig) > size and w in orig
                           for orig in word_set)), (w, size)
    # coverage: concatenation of chunk spans touches the whole text
    covered = set()
    for _, _, cs, ce in chunks:
        covered.update(range(cs, ce))
    missing = [i for i, ch in enumerate(text)
               if ch not in (" ", "\n") and i not in covered]
    assert missing == []


@given(TEXTY)
@settings(max_examples=100, deadline=None)
def test_embedding_unit_norm_and_determinism(s):
    from llm_knowledge_graph_spark.reference_impl import embed_text
    v1, v2 = embed_text(s), embed_text(s)
    assert v1 == v2 and len(v1) == 64
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-9


@given(st.sets(st.integers(min_value=0, max_value=5000),
               min_size=10, max_size=200),
       st.sets(st.integers(min_value=0, max_value=5000),
               min_size=10, max_size=200))
@settings(max_examples=50, deadline=None)
def test_minhash_estimates_jaccard(a, b):
    """MinHash signature agreement ≈ Jaccard within a generous bound —
    the property the LSH banding math relies on (128 perms → se ≈ 0.044;
    bound at 5 se)."""
    from llm_knowledge_graph_spark.operators.linking import minhash_signature
    sa = [str(x) for x in sorted(a)]
    sb = [str(x) for x in sorted(b)]
    sig_a = minhash_signature(sa, num_perm=128)
    sig_b = minhash_signature(sb, num_perm=128)
    est = sum(x == y for x, y in zip(sig_a, sig_b)) / 128
    true = len(a & b) / len(a | b)
    assert abs(est - true) <= 0.25
