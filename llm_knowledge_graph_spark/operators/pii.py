"""PII detection and redaction for web-scale training corpora.

Standard pre-training hygiene (the C4 / Dolma / BigScience pipelines all
carry a pass like this): regex-detect emails, phone numbers and IPv4
addresses, count them per document, and mask them with typed placeholder
tokens before the text reaches dedup / tokenization.

Pattern dialect: every regex below is written in the Java-regex ∩ RE2
common subset (character classes, bounded repetition, word boundaries —
no backreferences, no lookaround) so the SAME pattern string runs
verbatim in Spark's JVM `regexp_replace`/`regexp_count` AND in DuckDB's
RE2 engine, which is what lets the driver value-hash the result against
an ANSI oracle (same discipline as operators/legal_ner.py).

Scale notes: pure whole-stage-codegen string expressions — no Python in
the pipeline, no shuffle at all (row-local map), so the pass is
embarrassingly parallel and fuses into whatever scan feeds it. At 100 TB
the only knob that matters is that the regexes are RE2-safe (linear-time,
no catastrophic backtracking on adversarial crawl text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java ∩ RE2 subset — see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Redaction order matters: emails first (an email's domain would otherwise
# feed the IPv4-ish pattern nothing, but a phone-like local part could
# collide), then IPv4 BEFORE phone so dotted quads are never half-eaten.
PII_PATTERNS = (("email", EMAIL_RE, "<EMAIL>"),
                ("ipv4", IPV4_RE, "<IP>"),
                ("phone", PHONE_RE, "<PHONE>"))


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append exact per-doc match counts: n_email, n_ipv4, n_phone."""
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(F.col(text_col), F.lit(pat)))
    return out

def redact(df: DataFrame, text_col: str = "text",
           out_col: str = "redacted") -> DataFrame:
    """Append ``out_col``: the text with every PII span replaced by its
    typed placeholder, applied in PII_PATTERNS order."""
    expr = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, token)
    return df.withColumn(out_col, expr)


def pii_report(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Per-doc PII audit row: (key, n_email, n_ipv4, n_phone,
    redacted_md5, redacted_len) — the digest (not the redacted text)
    keeps the audit table narrow at corpus scale while still
    value-verifying the exact redacted bytes."""
    out = redact(pii_counts(df, text_col), text_col)
    # counts/length ride as BIGINT: regexp_count/length are int32 in Spark
    # but any SQL twin (and downstream corpus rollups) carry BIGINT
    return out.select(
        F.col(key_col),
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}")
          for n, _, _ in PII_PATTERNS],
        F.md5(F.col("redacted")).alias("redacted_md5"),
        F.length("redacted").cast("long").alias("redacted_len"))
