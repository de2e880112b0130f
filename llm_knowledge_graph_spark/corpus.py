"""Deterministic Common-Crawl-style pages fixture synthesizer.

Shape follows BASELINE.json's input_hint exactly:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Properties engineered into the corpus (FIXTURES.md §A1):
  * sentence-templated English whose triples are exactly predictable by the
    deterministic extractor (reference_impl.extract_chunk);
  * deliberate alias variants ("John Doe" / "J. Doe" / "Doe, John") with
    known cluster membership → ground truth for entity linking;
  * hot entities repeated across many urls → skew fixture for salting/AQE;
  * a slice of rows with text=None to force extraction from html;
  * non-en rows that the language filter must drop;
  * html wraps the text in nav/footer/script boilerplate so html→text
    extraction is non-trivial (byte-identity checked per url).

Everything is a pure function of (n_pages, seed) — no wall clock, no RNG
state leakage (one random.Random per call).
"""

from __future__ import annotations

import datetime
import html as _htmllib
import random
from typing import Any, Dict, List, Tuple

FIRST_NAMES = ["John", "Jane", "Alice", "Robert", "Maria", "Wei", "Fatima",
               "Carlos", "Yuki", "Olga", "Peter", "Linda"]
# unique initials so "John D." style aliases are unambiguous (clean linking
# ground truth — no cross-cluster bridges)
LAST_NAMES = ["Doe", "Smith", "Novak", "Garcia", "Chen", "Kim", "Muller",
              "Rossi", "Baker", "Tanaka"]
ORGS = ["Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Co", "Stark Industries",
        "Wayne Enterprises", "Hooli Inc", "Vandelay Industries"]
PLACES = ["Berlin", "Prague", "Tokyo", "Lisbon", "Toronto", "Bratislava", "Oslo"]
TERMS = ["Agreement", "Effective Date", "Confidential Information", "Service Level",
         "Force Majeure", "Licensed Material"]
LANGS = ["en", "en", "en", "en", "es", "de", "fr", "zh", "sk"]  # en-heavy mix

# hot entities: appear in a large fraction of pages (skew fixture)
HOT_PERSON = "John Doe"
HOT_ORG = "Acme Corp"


def alias_variants(first: str, last: str) -> List[str]:
    """Known coreference cluster for a person name (ground truth for linking).

    Variants are unambiguous across clusters (FIRST_NAMES distinct,
    LAST_NAMES distinct) and dot-free so the sentence splitter never breaks
    inside a name: "John Doe" / "Doctor John Doe" / "John Doe Jr".
    """
    return [f"{first} {last}", f"Doctor {first} {last}", f"{first} {last} Jr"]


def _person(rng: random.Random) -> str:
    return f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"


def _person_maybe_alias(rng: random.Random) -> str:
    first, last = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
    return rng.choice(alias_variants(first, last))


def _sentences(rng: random.Random, i: int) -> List[str]:
    """Template sentences whose extraction output is fully predictable."""
    sents: List[str] = []
    n_sent = 3 + rng.randrange(8)
    for _ in range(n_sent):
        kind = rng.randrange(10)
        if kind < 3:  # SVO person-org (hot entities over-represented)
            person = HOT_PERSON if rng.random() < 0.35 else _person_maybe_alias(rng)
            org = HOT_ORG if rng.random() < 0.35 else rng.choice(ORGS)
            verb = rng.choice(["works for", "founded", "leads", "shall report to"])
            if verb == "works for" and rng.random() < 0.5:
                sents.append(f"{person} works for {org} since {1990 + rng.randrange(35)}.")
            else:
                sents.append(f"{person} {verb} {org}.")
        elif kind < 5:  # org-org
            a, b = rng.sample(ORGS, 2)
            verb = rng.choice(["acquired", "partnered with", "invested in", "sued"])
            sents.append(f"{a} {verb} {b}.")
        elif kind < 6:  # person-person
            p1, p2 = _person(rng), _person(rng)
            sents.append(f"{p1} {rng.choice(['loves', 'married'])} {p2}.")
        elif kind < 7:  # org-place / person-place
            if rng.random() < 0.5:
                sents.append(f"{rng.choice(ORGS)} is located in {rng.choice(PLACES)}.")
            else:
                sents.append(f"{_person(rng)} moved to {rng.choice(PLACES)}.")
        elif kind < 8:  # definition (ref legal_graphrag.py:213 shape)
            term = rng.choice(TERMS)
            sents.append(f'"{term}" means the {term.lower()} described in this '
                         f"document number {i}.")
        elif kind < 9:  # section header + citation (ref :222 shape)
            a, b = 1 + rng.randrange(30), 1 + rng.randrange(30)
            sents.append(f"Section {a}: General Provisions {i}")
            if a != b:
                sents.append(f"§ {a} cites § {b}.")
        else:  # filler — must extract to nothing
            sents.append("the quick brown fox jumps over the lazy dog again and again.")
    return sents


def make_html(text: str, url: str) -> bytes:
    """Wrap ground-truth text in boilerplate; html_to_text must recover `text`
    byte-identically (paragraphs = lines, joined with newline)."""
    paras = "".join(f"<p>{_htmllib.escape(line)}</p>" for line in text.split("\n"))
    doc = (
        "<html><head><title>synthetic</title>"
        "<script>var t=track('" + url + "');</script>"
        "<style>.x{color:red}</style></head>"
        "<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
        "<header>SiteHeader</header>"
        f"<main><article>{paras}</article></main>"
        "<aside>ads ads ads</aside>"
        "<footer>(c) synthetic crawl</footer></body></html>"
    )
    return doc.encode("utf-8")


_EPOCH = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def make_page(i: int, seed: int = 42, n_sites: int = 10) -> Dict[str, Any]:
    """One page as a pure function of (seed, i) — enables DISTRIBUTED corpus
    synthesis (each Spark task generates its own index range; no driver
    bottleneck, no cross-row RNG state)."""
    rng = random.Random(f"{seed}:{i}")
    lang = LANGS[rng.randrange(len(LANGS))]
    site = rng.randrange(max(1, n_sites))
    url = f"https://example.org/site{site}/page{i}"
    text = "\n".join(_sentences(rng, i))
    html_bytes = make_html(text, url)
    # ~30% of rows carry html only → the pipeline must extract text
    text_col = None if rng.random() < 0.30 else text
    return {
        "url": url,
        "warc_ts": _EPOCH + datetime.timedelta(seconds=i * 137),
        "html": html_bytes,
        "text": text_col,
        "lang": lang,
    }


def make_pages(n_pages: int = 200, seed: int = 42) -> List[Dict[str, Any]]:
    """The pages corpus as plain dicts (driver-side oracle path)."""
    n_sites = 1 + n_pages // 20
    return [make_page(i, seed, n_sites) for i in range(n_pages)]


def expected_alias_clusters() -> List[List[str]]:
    """Ground-truth coreference clusters (post-normalization .title() ids) for
    every (first, last) combination used by the synthesizer."""
    clusters = []
    for first in FIRST_NAMES:
        for last in LAST_NAMES:
            variants = alias_variants(first, last)
            clusters.append([v.title() for v in variants])
    return clusters
