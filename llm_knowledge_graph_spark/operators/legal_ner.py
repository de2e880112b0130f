"""E8/E9: rule-based legal NER — the full pattern breadth of the reference's
LegalNLPProcessor (ref code/legal-llm/legal_graphrag.py:103-230):

  * statute citations      "42 U.S.C. § 1983"     (ref :112-117, STATUTE)
  * case citations         "123 F.3d 456"         (ref :120-124, CASE_CITATION)
  * CFR regulations        "29 CFR 1910.1200"     (ref :127-131, REGULATION)
  * obligation sentences   shall / shall not / may (ref :134-136, :204-210)
  * effective dates        (ref :139-142; deterministic ISO-date stand-in)
  * amounts (MONEY)        (ref :199-202; deterministic $-regex stand-in)
  * definitions            '"X" means ...'        (ref :212-219)
  * section headers        'Section N: title'     (ref :221-228)

Spark-first: every extractor is a pure JVM column expression
(regexp_extract_all / split / filter — whole-stage codegen, zero Python),
unlike the reference's spaCy EntityRuler token patterns. The regexes stay
in the RE2 ∩ Java-regex common subset (no lookaround, no backrefs) so the
SAME pattern strings run under DuckDB in the driver's oracle.

The reference resolves PERSON/ORG/DATE/MONEY via spaCy's statistical NER
(ref :189-202); per the north rule those are replaced by deterministic
patterns — dates and amounts port exactly (format-driven), and parties
(ref :189-197 PERSON/ORG) get dedicated recital patterns (round 3):
the "between X and Y" contract recital plus "Party:/Client:/Vendor: NAME"
designation clauses (extract_parties below). The SVO name matching in
operators/extract.py still covers parties in running prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2- and Java-compatible pattern strings (shared with the DuckDB oracle).
STATUTE_RE = r"(?i)\d+\s+u\.?s\.?c\.?\s+(?:§|section)\s+\d+"
CASE_CITATION_RE = r"\d+\s+F\.\d?d?\s+\d+"
CFR_RE = r"\d+\s+CFR\s+\d+(?:\.\d+)?"
MONEY_RE = r"\$\d+(?:,\d{3})*(?:\.\d{2})?"
ISO_DATE_RE = r"\d{4}-\d{2}-\d{2}"
# ref :213 (same pattern as reference_impl._DEFINITION_RE, RE2-safe)
DEFINITION_RE = r'(?i)"([^"]+)"\s+(?:means?|refers? to|is defined as)\s+([^.]+\.)'
# ref :222
SECTION_RE = r"(?:Section|Article|§)\s+(\d+(?:\.\d+)*)[:.]?\s*([^\n]+)"
# sentence boundary WITHOUT lookbehind (RE2 has none): consume '.' + space
SENT_SPLIT_RE = r"\.\s+"
# party recital "between X and Y" — a name is capitalized words; 'and' is
# lowercase so it can never be swallowed into the first name (RE2-safe,
# no backrefs). ref :189-197 (spaCy PERSON/ORG party resolution).
PARTY_BETWEEN_RE = (r"between\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)*)"
                    r"\s+and\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)*)")
# designation clause "Party:/Client:/Vendor: NAME"
PARTY_NAMED_RE = r"(?:Party|Client|Vendor):\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+)*)"


def _extract_all(text_col, pattern: str, group: int = 0):
    return F.regexp_extract_all(text_col, F.lit(pattern), F.lit(group))


def extract_citations(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """→ (id, ctype, cite): one row per citation occurrence, typed
    STATUTE / CASE_CITATION / REGULATION like the reference's labels."""
    t = F.col(text_col)
    tagged = F.concat(
        F.transform(_extract_all(t, STATUTE_RE),
                    lambda c: F.struct(F.lit("STATUTE").alias("ctype"),
                                       c.alias("cite"))),
        F.transform(_extract_all(t, CASE_CITATION_RE),
                    lambda c: F.struct(F.lit("CASE_CITATION").alias("ctype"),
                                       c.alias("cite"))),
        F.transform(_extract_all(t, CFR_RE),
                    lambda c: F.struct(F.lit("REGULATION").alias("ctype"),
                                       c.alias("cite"))),
    )
    return (df.select(F.col(id_col), F.explode(tagged).alias("c"))
            .select(id_col, F.col("c.ctype").alias("ctype"),
                    F.col("c.cite").alias("cite")))


def obligation_counts(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """→ (id, n_obligation, n_prohibition, n_permission): sentence-level
    shall / shall not / may classification (ref :204-210: a sentence with
    'shall' is an obligation, 'prohibition' when it contains 'shall not';
    'may' → PERMISSION ref :135)."""
    # word-boundary regexes, not substrings: the reference's spaCy patterns
    # are TOKEN-exact ({LOWER: "may"}), so "dismay" must not count
    sents = F.split(F.lower(F.col(text_col)), SENT_SPLIT_RE)
    has_shall = F.filter(sents, lambda s: s.rlike(r"\bshall\b"))
    n_prohib = F.size(F.filter(sents, lambda s: s.rlike(r"\bshall not\b")))
    n_perm = F.size(F.filter(sents, lambda s: s.rlike(r"\bmay\b")))
    return df.select(
        F.col(id_col),
        (F.size(has_shall) - n_prohib).alias("n_obligation"),
        n_prohib.alias("n_prohibition"),
        n_perm.alias("n_permission"),
    )


def extract_definitions(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """→ (id, term, definition): first definition per document (ref :212-219
    pattern; regexp_extract returns '' when absent — filtered out)."""
    t = F.col(text_col)
    return (df.select(
        F.col(id_col),
        F.regexp_extract(t, DEFINITION_RE, 1).alias("term"),
        F.regexp_extract(t, DEFINITION_RE, 2).alias("definition"),
    ).filter(F.col("term") != ""))


def extract_sections(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """→ (id, sec_number, sec_title): first section header per document
    (ref :221-228)."""
    t = F.col(text_col)
    return (df.select(
        F.col(id_col),
        F.regexp_extract(t, SECTION_RE, 1).alias("sec_number"),
        F.regexp_extract(t, SECTION_RE, 2).alias("sec_title"),
    ).filter(F.col("sec_number") != ""))


def extract_parties(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """→ (id, role, party): E9 party extraction — deterministic stand-in
    for the reference's spaCy PERSON/ORG party resolution (ref :189-197).
    PARTY_A/PARTY_B from the first "between X and Y" recital, NAMED from
    the first "Party:/Client:/Vendor: NAME" designation. Pure regexp
    codegen; UNION ALL of three one-group extracts (each ANSI-mirrorable,
    empty extracts filtered)."""
    t = F.col(text_col)
    empty = F.array().cast("array<struct<role:string,party:string>>")
    a = F.regexp_extract(t, PARTY_BETWEEN_RE, 1)
    b = F.regexp_extract(t, PARTY_BETWEEN_RE, 2)
    nm = F.regexp_extract(t, PARTY_NAMED_RE, 1)
    # ONE projection over the text (not a 3-way UNION re-scanning /
    # re-synthesizing it): both recital groups come from the same match,
    # so a != '' ⇔ b != ''
    parties = F.concat(
        F.when(a != "", F.array(
            F.struct(F.lit("PARTY_A").alias("role"), a.alias("party")),
            F.struct(F.lit("PARTY_B").alias("role"), b.alias("party"))))
        .otherwise(empty),
        F.when(nm != "", F.array(
            F.struct(F.lit("NAMED").alias("role"), nm.alias("party"))))
        .otherwise(empty),
    )
    return (df.select(F.col(id_col), F.explode(parties).alias("p"))
            .select(id_col, F.col("p.role").alias("role"),
                    F.col("p.party").alias("party")))


def extract_dates_amounts(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """→ (id, eff_date, amount): deterministic DATE/MONEY stand-ins for the
    reference's spaCy NER classes (ref :194-202)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_extract(t, ISO_DATE_RE, 0).alias("eff_date"),
        F.regexp_extract(t, MONEY_RE, 0).alias("amount"),
    )
