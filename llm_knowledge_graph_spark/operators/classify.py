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

# Reference-taxonomy rulesets (round 3): deterministic keyword rules whose
# CATEGORY LABELS are the reference's real taxonomies — legislation types
# from code/assets/TYP_PREDPISU.md and top-level legal areas from
# code/assets/CLENENIE_PRAVA.md (the taxonomies the classification prompt
# code/prompts.py:140-166 feeds the LLM). Keywords are the type words /
# area markers as they appear in statute text, multi-word forms first
# (precedence: "ústavný zákon" must not fall through to "zákon").
LEGISLATION_RULES: List[Tuple[str, str]] = [
    ("ústavný zákon", "Ústavný zákon"),
    ("nariadenie vlády", "Nariadenie vlády"),
    ("zákon", "Zákon"),
    ("vyhláška", "Vyhláška"),
    ("nariadenie", "Nariadenie"),
    ("smernica", "Smernica"),
    ("rozhodnutie", "Rozhodnutie"),
    ("uznesenie", "Uznesenie"),
    ("opatrenie", "Opatrenie"),
    ("oznámenie", "Oznámenie"),
    ("dohoda", "Dohoda"),
    ("zmluva", "Zmluva"),
]
LEGAL_AREA_RULES: List[Tuple[str, str]] = [
    ("daň", "Finančné právo"),
    ("dane", "Finančné právo"),
    ("rozpočt", "Finančné právo"),
    ("bank", "Finančné právo"),
    ("obstarávan", "Hospodárske právo"),
    ("privatizáci", "Hospodárske právo"),
    ("medzinárodn", "Medzinárodné právo"),
    ("obchodn", "Obchodné právo"),
    ("občiansk", "Občianske právo"),
    ("pracovn", "Pracovné právo"),
    ("európsk", "Právo EÚ"),
    ("sociálne", "Právo sociálneho zabezpečenia"),
    ("správn", "Správne právo"),
    ("trestn", "Trestné právo"),
    ("ústavn", "Ústavné právo"),
    ("vojensk", "Vojenské právo"),
]


def keyword_classify(df: DataFrame, text_col: str = "text",
                     rules: List[Tuple[str, str]] = DEFAULT_RULES,
                     default: str = DEFAULT_CATEGORY,
                     out_type_col: str = "doc_type",
                     out_conf_col: str = "confidence") -> DataFrame:
    """Adds `out_type_col` (first matching rule) and `out_conf_col`
    (matched-keyword occurrences, capped at 100; 0 for the default class).
    Parameterized by ruleset — DEFAULT_RULES for the driver's bag-of-words
    fixture, LEGISLATION_RULES / LEGAL_AREA_RULES for the reference's real
    taxonomies (classify_reference_taxonomy)."""
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
    return df.withColumn(out_type_col, doc_type) \
             .withColumn(out_conf_col, confidence)


def classify_reference_taxonomy(df: DataFrame,
                                text_col: str = "text") -> DataFrame:
    """E11 in the reference's OWN response shape (code/prompts.py:140-166:
    {type_legislation, type_category}, each a name + 0-100 confidence):
    two keyword-rule passes over lowercased text against the two reference
    taxonomies. Adds type_legislation / leg_confidence / type_category /
    cat_confidence; default class '(Ostatné)' is TYP_PREDPISU.md's own
    catch-all bucket. One CASE chain per dimension — pure codegen."""
    lowered = "_lc_" + text_col
    out = df.withColumn(lowered, F.lower(F.col(text_col)))
    out = keyword_classify(out, lowered, LEGISLATION_RULES,
                           default="(Ostatné)",
                           out_type_col="type_legislation",
                           out_conf_col="leg_confidence")
    out = keyword_classify(out, lowered, LEGAL_AREA_RULES,
                           default="(Ostatné)",
                           out_type_col="type_category",
                           out_conf_col="cat_confidence")
    return out.drop(lowered)
