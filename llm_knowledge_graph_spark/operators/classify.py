"""E11: text classification — keyword-rule classifier.

The reference's classification stage is a stub (`classification()`,
ref code/pdf_graphrag.py:570-571) whose prompt + response schema exist
(ref code/prompts.py:140-166: {type_legislation, type_category} each with a
name + 0-100 confidence, taxonomies in code/assets/). Deterministic engine
equivalent: an ordered keyword-rule chain compiled to one JVM CASE
expression (first matching rule wins, like taxonomy precedence), with
confidence = occurrence count of the matched keyword capped at 100 —
entirely codegen, ANSI-expressible, oracled by the driver.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (keyword, category) in precedence order — the fixture taxonomy for the
# driver's bag-of-words documents table
DEFAULT_RULES: List[Tuple[str, str]] = [
    ("stream", "Streaming"),
    ("vector", "VectorSearch"),
    ("window", "Windowed"),
    ("join", "Relational"),
]
DEFAULT_CATEGORY = "General"


def keyword_classify(df: DataFrame, text_col: str = "text",
                     rules: List[Tuple[str, str]] = DEFAULT_RULES,
                     default: str = DEFAULT_CATEGORY) -> DataFrame:
    """Adds `doc_type` (first matching rule) and `confidence` (matched-
    keyword occurrences, capped at 100; 0 for the default class)."""
    import re as _re
    t = F.col(text_col)
    doc_type = F.lit(default)
    confidence = F.lit(0)
    for kw, cat in reversed(rules):
        # LITERAL occurrence count — the keyword is escaped so rule words
        # carrying regex metacharacters ("c++") count consistently with
        # the literal `contains` match test
        hits = (F.length(t)
                - F.length(F.regexp_replace(t, F.lit(_re.escape(kw)),
                                            F.lit("")))) / len(kw)
        doc_type = F.when(t.contains(kw), F.lit(cat)).otherwise(doc_type)
        confidence = F.when(t.contains(kw),
                            F.least(hits.cast("int"), F.lit(100))) \
            .otherwise(confidence)
    return df.withColumn("doc_type", doc_type) \
             .withColumn("confidence", confidence)
