"""Text-analysis column expressions for large-scale training-data pipelines.

All JVM-side built-ins (whole-stage codegen) — no Python in the hot path:
token counting, quality scoring (length/punct/stopword ratios), language-ID
(stopword-marker heuristic), fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker vocabularies for the n-gram/stopword language-ID
# heuristic (deterministic; real deployments plug a fastText-style model into
# the same operator shape)
LANG_MARKERS = {
    "en": ["the", "of", "and", "to", "is", "a"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una", "de"],
    "sk": ["a", "je", "na", "sa", "to", "v"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (split keeps no empty tokens for trimmed text)."""
    return F.split(F.trim(col), r"\s+")


def safe_seq(end: Column, start: int = 1) -> Column:
    """Ascending-or-EMPTY integer sequence [start..end] — the safe index
    generator for n-gram transforms over token arrays.

    ``F.sequence(lit(1), size(toks) - k)`` is a trap: when
    size(toks) <= k the sequence is DESCENDING ([1, 0], [1, 0, -1], …)
    and the element_at/slice calls inside the transform lambda index
    past the array. A row filter like ``size(toks) >= k + 1`` does NOT
    protect the expression — Catalyst infers predicates over the gram
    expression from downstream operators (InferFiltersFromGenerate
    under an explode) and can evaluate the transform before/alongside
    the size guard (observed: codegen'd Filter evaluating the transform
    as a common subexpression). The gram expression itself must be
    total; an empty index sequence makes the transform yield [] and the
    lambda never run."""
    return F.when(end >= start, F.sequence(F.lit(start), end)).otherwise(
        F.array().cast("array<int>"))


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col)))


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    return (F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
            .cast("double") / F.size(t))


def punct_ratio(col: Column) -> Column:
    """punctuation chars / total chars."""
    stripped = F.regexp_replace(col, r"[^\p{Punct}]", "")
    return F.length(stripped).cast("double") / F.length(col)


def stopword_ratio(col: Column, stopwords=None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    t = tokens(F.lower(col))
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return hits.cast("double") / F.size(t)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word length,
    some (but not all) stopwords, low punctuation."""
    n = token_count(col).cast("double")
    len_ok = F.least(n / F.lit(50.0), F.lit(1.0))
    wl = avg_token_len(col)
    wl_ok = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    return F.round((len_ok + wl_ok + punct_ok) / 3.0, 4)


def lang_scores(col: Column) -> dict:
    """Per-language marker-hit counts (language-ID heuristic)."""
    t = tokens(F.lower(col))
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def fingerprint(col: Column, prefix_chars: int = 64) -> Column:
    """Cheap document fingerprint: md5 of the normalized text prefix.
    (Content-defined rolling-hash fingerprints live in hashing.simhash.)"""
    normalized = F.lower(F.regexp_replace(col, r"\s+", " "))
    return F.md5(F.substring(normalized, 1, prefix_chars))
