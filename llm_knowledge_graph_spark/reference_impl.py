"""Plain-Python reference implementation of every deterministic stage.

This module is the *oracle*: the Spark operators call these exact functions
inside Arrow-batched pandas UDFs, and the pytest suite re-runs them on the
driver to assert bit-identical output (text byte-identity per url, triple
P/R = 1.0 on the fixture corpus).

Semantics are lifted from the reference (cited per function):
  - property-key camelCase      ref: code/pdf_graphrag.py:30-40
  - node-type capitalize        ref: code/pdf_graphrag.py:43-50 (default :27)
  - rel-type UPPER_SNAKE        ref: code/pdf_graphrag.py:53-60
  - node-id .title()            ref: code/pdf_graphrag.py:437-439
  - invalid node/edge drops     ref: code/pdf_graphrag.py:421-424, 454-456
  - case-insensitive endpoint
    resolution within a chunk   ref: code/pdf_graphrag.py:459-468
  - chunk node + HAS edges      ref: code/pdf_graphrag.py:406-417, 484-492
  - chunking params 1024/128    ref: code/pdf_graphrag.py:825
  - definition regex            ref: code/legal-llm/legal_graphrag.py:213
  - section regex               ref: code/legal-llm/legal_graphrag.py:222
  - obligation "shall"/"shall not"  ref: code/legal-llm/legal_graphrag.py:204-210
  - SVO verb-pattern triples    ref: code/pdf_graphrag.py:101-128 (spaCy
    dependency SVO, here a deterministic verb-lexicon matcher over the same
    sentence shapes)

NO code is copied from the reference — only the observable input/output
contracts are reproduced (the reference implements these with spaCy/LLM
calls; we implement them with regexes and pure functions).

Python's `str.capitalize()` / `str.title()` differ from Spark's `initcap`
on apostrophes/digits/unicode, so these stay Python functions and the Spark
side calls them through pandas UDFs — never approximated with SQL exprs.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import math
import re
import struct
from html.parser import HTMLParser
from typing import Any, Dict, Iterator, List, Optional, Tuple

DEFAULT_NODE_TYPE = "Entity"  # ref: code/pdf_graphrag.py:27
CHUNK_SIZE = 1024             # ref: code/pdf_graphrag.py:825
CHUNK_OVERLAP = 128
SCHEMA_CHUNK_SIZE = 1200      # ref: code/pdf_graphrag.py:811
SCHEMA_CHUNK_OVERLAP = 200
EMBEDDING_DIM = 64            # fixture stands in for 3072-d (ref :193,408)

# ---------------------------------------------------------------------------
# N1-N4: normalization primitives (bit-exact Python string semantics)
# ---------------------------------------------------------------------------


def format_property_key(s: str) -> str:
    """'first name' -> 'firstName'. ref: code/pdf_graphrag.py:30-40."""
    words = s.split()
    if not words:
        return s
    return "".join([words[0].lower()] + [w.capitalize() for w in words[1:]])


def format_node_type(node_type: Optional[str]) -> str:
    """'person' -> 'Person'; blank -> 'Entity'. ref: code/pdf_graphrag.py:43-50."""
    if not node_type or not node_type.strip():
        return DEFAULT_NODE_TYPE
    return node_type.strip().capitalize()


def format_relationship_type(rel_type: Optional[str]) -> str:
    """'works for' -> 'WORKS_FOR'; falsy -> 'RELATED_TO'. ref: code/pdf_graphrag.py:53-60."""
    if not rel_type:
        return "RELATED_TO"
    return rel_type.strip().replace(" ", "_").upper()


def normalize_node_id(node_id: Any) -> str:
    """strip; .title() unless first char is a digit. ref: code/pdf_graphrag.py:437-439."""
    normalized = str(node_id).strip()
    if normalized and not normalized[0].isdigit():
        normalized = normalized.title()
    return normalized


# ---------------------------------------------------------------------------
# S1: HTML → text extraction (trafilatura-style main-content extraction).
# Byte-identical per url is the north-rule invariant, so this must be a pure
# function of the html bytes.
# ---------------------------------------------------------------------------

_BOILERPLATE_TAGS = {"head", "title", "script", "style", "nav", "footer",
                     "header", "aside", "noscript"}
_BLOCK_TAGS = {"p", "div", "section", "article", "main", "li", "h1", "h2", "h3", "h4",
               "br", "tr", "td", "th", "ul", "ol", "table", "blockquote", "pre"}


class _MainTextParser(HTMLParser):
    """Extracts readable text: drops boilerplate subtrees, keeps block structure."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: List[str] = []
        self._block_break = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BOILERPLATE_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._block_break = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _BOILERPLATE_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._block_break = True

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if data.strip():
            if self._block_break and self._parts:
                self._parts.append("\n")
            self._block_break = False
            self._parts.append(data.strip())

    def text(self) -> str:
        return " ".join(self._parts).replace(" \n ", "\n").strip()


def html_to_text(html_bytes: Optional[bytes]) -> str:
    """Pure-function main-content extraction from raw page bytes.

    Replaces the reference's PDF→text load (code/pdf_graphrag.py:785-788) for
    the Common-Crawl-style input of BASELINE.json's input_hint. Deterministic:
    same bytes → same string, everywhere.
    """
    if not html_bytes:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    parser = _MainTextParser()
    parser.feed(raw)
    parser.close()
    return parser.text()


# ---------------------------------------------------------------------------
# C1/C2: deterministic recursive character chunker.
# Mirrors RecursiveCharacterTextSplitter's contract (split on paragraph, then
# line, then word boundaries; windows of <= chunk_size chars with overlap) —
# ref: code/pdf_graphrag.py:811, 825. Pure function of (text, size, overlap).
# ---------------------------------------------------------------------------


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> List[Tuple[int, str, int, int]]:
    """Returns [(chunk_id, chunk_text, char_start, char_end), ...].

    Sliding window of `chunk_size` chars stepping `chunk_size - overlap`,
    snapped back to the nearest whitespace so words are never split (matching
    the word-boundary behavior of the reference's splitter).
    """
    if not text:
        return []
    step = max(1, chunk_size - overlap)
    chunks: List[Tuple[int, str, int, int]] = []
    start = 0
    cid = 0
    n = len(text)
    while start < n:
        end = min(start + chunk_size, n)
        at_boundary = True
        if end < n:
            # snap end back to a whitespace boundary (keep >= 1 char progress)
            ws = text.rfind(" ", start + 1, end)
            nl = text.rfind("\n", start + 1, end)
            snap = max(ws, nl)
            if snap > start:
                end = snap
            else:
                # a single word longer than chunk_size: hard character cut
                # (the reference's recursive splitter also falls back to
                # character-level splitting for over-length words)
                at_boundary = False
        chunk = text[start:end].strip()
        if chunk:
            chunks.append((cid, chunk, start, end))
            cid += 1
        if end >= n:
            break
        if not at_boundary:
            # continue exactly at the cut: the forward word-boundary snap
            # below would walk past the UNSEEN remainder of the long word,
            # silently dropping it (round-2 bug: 1 KB+ tokens — URLs,
            # base64 runs — lost their middles)
            start = end
            continue
        start = max(end - overlap, start + 1)
        # snap start forward to a word boundary (never passes `end`: after
        # a boundary cut text[end] is whitespace, which stops the walk)
        while start < n and start > 0 and text[start - 1] not in (" ", "\n") \
                and text[start] not in (" ", "\n"):
            start += 1
        while start < n and text[start] in (" ", "\n"):
            start += 1
    return chunks


# ---------------------------------------------------------------------------
# C4: deterministic embedding (fixture stand-in for text-embedding-3-large;
# ref: code/pdf_graphrag.py:193,408). Hash-seeded unit vector, 64-d.
# ---------------------------------------------------------------------------


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> List[float]:
    """Deterministic pseudo-embedding: sha256-expanded, L2-normalized."""
    out: List[float] = []
    counter = 0
    data = text.encode("utf-8", errors="replace")
    while len(out) < dim:
        h = hashlib.sha256(data + counter.to_bytes(4, "big")).digest()
        for i in range(0, 32, 4):
            if len(out) >= dim:
                break
            (u,) = struct.unpack(">I", h[i:i + 4])
            out.append((u / 0xFFFFFFFF) * 2.0 - 1.0)
        counter += 1
    norm = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / norm for x in out]


# ---------------------------------------------------------------------------
# E4/E7/E8/E9: the deterministic triple extractor.
#
# Stands in for the reference's per-chunk LLM extraction
# (schema_driven_extraction, code/pdf_graphrag.py:692-750) per the north rule
# ("LLM-based triple extraction replaced by batched pandas/Arrow UDFs running
# a deterministic extractor"). It emits the SAME response shape the LLM
# contract defines (code/prompts.py:30-77): raw nodes
# {id, type, properties} and raw relationships
# {source_node_id, target_node_id, relation, properties} — normalization is
# applied afterwards by build_graph_document (as the reference does).
# ---------------------------------------------------------------------------

# Verb lexicon: surface phrase -> (relation, subj_type, obj_type).
# Shapes mirror the SVO dependency patterns of code/pdf_graphrag.py:101-128
# and the obligation markers of code/legal-llm/legal_graphrag.py:134-136.
VERB_LEXICON: Dict[str, Tuple[str, str, str]] = {
    "works for": ("works for", "person", "organization"),
    "founded": ("founded", "person", "organization"),
    "leads": ("leads", "person", "organization"),
    "acquired": ("acquired", "organization", "organization"),
    "employs": ("employs", "organization", "person"),
    "partnered with": ("partnered with", "organization", "organization"),
    "invested in": ("invested in", "organization", "organization"),
    "sued": ("sued", "organization", "organization"),
    "loves": ("loves", "person", "person"),
    "married": ("married", "person", "person"),
    "is located in": ("located in", "organization", "place"),
    "moved to": ("moved to", "person", "place"),
    "shall report to": ("shall report to", "person", "organization"),
    "shall not disclose to": ("shall not disclose to", "person", "organization"),
}

# A name word: capitalized token, optional trailing dot (initials "J.",
# honorifics "Dr."). SVO matching runs per sentence with terminal punctuation
# stripped, so the dot never slurps sentence boundaries.
_NAME = r"[A-Z][A-Za-z&\-]*\.?(?:\s[A-Z][A-Za-z&\-]*\.?)*"
_VERBS_ALT = "|".join(
    re.escape(v) for v in sorted(VERB_LEXICON, key=len, reverse=True)
)
_SVO_RE = re.compile(
    rf"(?P<subj>{_NAME})\s+(?P<verb>{_VERBS_ALT})\s+(?P<obj>{_NAME})"
    r"(?:\s+since\s+(?P<since>\d{4}))?"
)
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+|\n")
# ref: code/legal-llm/legal_graphrag.py:213
_DEFINITION_RE = re.compile(
    r'"([^"]+)"\s+(?:means?|refers? to|is defined as)\s+([^.]+\.)', re.IGNORECASE
)
# ref: code/legal-llm/legal_graphrag.py:222
_SECTION_RE = re.compile(r"(?:Section|Article|§)\s+(\d+(?:\.\d+)*)[:\.]?\s*([^\n]+)")
# "§ N cites § M" cross-reference shape (README completeness target: cross-refs)
_CITES_RE = re.compile(r"§\s+(\d+(?:\.\d+)*)\s+cites\s+§\s+(\d+(?:\.\d+)*)")


def extract_chunk(text: str) -> Dict[str, List[Dict[str, Any]]]:
    """Deterministic NER+RE over one chunk → raw LLM-contract-shaped output.

    Emits nodes/relationships in the response schema of code/prompts.py:30-77
    (pre-normalization): duplicate node ids may appear (dict-dedup by id at
    the end, first-type-wins like the reference's spaCy path
    code/pdf_graphrag.py:102-107 where nodes is a dict keyed by surface text).
    """
    nodes: Dict[str, Dict[str, Any]] = {}
    rels: List[Dict[str, Any]] = []

    def add_node(nid: str, ntype: str, props: Optional[Dict[str, Any]] = None) -> None:
        key = nid.strip().lower()
        if key not in nodes:
            nodes[key] = {"id": nid, "type": ntype, "properties": props or {"name": nid}}

    # SVO per sentence (sentence-scoped like the reference's spaCy
    # dependency pass, code/pdf_graphrag.py:110-122)
    for sentence in _SENT_SPLIT_RE.split(text):
        sentence = sentence.strip().rstrip(".!?")
        if not sentence:
            continue
        for m in _SVO_RE.finditer(sentence):
            subj, verb, obj = m.group("subj"), m.group("verb"), m.group("obj")
            relation, subj_type, obj_type = VERB_LEXICON[verb]
            add_node(subj, subj_type)
            add_node(obj, obj_type)
            props: Dict[str, Any] = {}
            if m.group("since"):
                props["since year"] = m.group("since")
            rels.append({
                "source_node_id": subj,
                "target_node_id": obj,
                "relation": relation,
                "properties": props,
            })

    for m in _DEFINITION_RE.finditer(text):
        term, definition = m.group(1), m.group(2).strip()
        add_node(term, "term", {"name": term, "definition text": definition})

    for m in _SECTION_RE.finditer(text):
        number, title = m.group(1), m.group(2).strip()
        sid = f"§ {number}"
        add_node(sid, "section", {"name": sid, "section title": title})

    for m in _CITES_RE.finditer(text):
        a, b = f"§ {m.group(1)}", f"§ {m.group(2)}"
        add_node(a, "section")
        add_node(b, "section")
        rels.append({
            "source_node_id": a,
            "target_node_id": b,
            "relation": "cites",
            "properties": {},
        })

    return {"nodes": list(nodes.values()), "relationships": rels}


# ---------------------------------------------------------------------------
# E1+E3: open-domain schema detection + refinement (deterministic stand-ins
# for the reference's two LLM passes: open_domain_detection
# ref code/pdf_graphrag.py:577-616 with response schema
# code/prompts.py:200-223, and schema_refinement ref :648-687).
# The LLM proposer is replaced by the deterministic extractor's label
# vocabulary (the types extract_chunk would emit for the chunk); the LLM
# consolidator is replaced by the deterministic canonicalizer the prompt
# rules demand (PROMPTS.md: singular PascalCase node labels, UPPER_SNAKE
# relationship labels) — i.e. format_node_type / format_relationship_type
# + case-insensitive dedupe + sort.
# ---------------------------------------------------------------------------


def propose_chunk_schema(text: str) -> Dict[str, List[str]]:
    """E1 stand-in: per-chunk label/relationship vocabulary proposal in the
    reference's response shape {list_nodes, list_relationships}
    (code/prompts.py:200-223). Raw (pre-canonicalization) labels, first-seen
    order, case-insensitively deduped within the chunk. Callers chunk at
    SCHEMA_CHUNK_SIZE/SCHEMA_CHUNK_OVERLAP (1200/200, ref :811)."""
    raw = extract_chunk(text)
    nodes: List[str] = []
    seen_n: set = set()
    for n in raw["nodes"]:
        t = n["type"]
        if t.lower() not in seen_n:
            seen_n.add(t.lower())
            nodes.append(t)
    rels: List[str] = []
    seen_r: set = set()
    for r in raw["relationships"]:
        t = r["relation"]
        if t.lower() not in seen_r:
            seen_r.add(t.lower())
            rels.append(t)
    return {"list_nodes": nodes, "list_relationships": rels}


def refine_schema(proposals: List[Dict[str, List[str]]]) -> Dict[str, List[str]]:
    """E3 stand-in: consolidate per-chunk vocabularies into ONE schema
    (ref schema_refinement code/pdf_graphrag.py:648-687). Labels →
    PascalCase via format_node_type, relationship types → UPPER_SNAKE via
    format_relationship_type (the PROMPTS.md rules), set-deduped, sorted —
    deterministic regardless of proposal order."""
    nodes = sorted({format_node_type(t)
                    for p in proposals for t in p["list_nodes"]})
    rels = sorted({format_relationship_type(t)
                   for p in proposals for t in p["list_relationships"]})
    return {"nodes": nodes, "relationships": rels}


def reference_detect_schema(pages: List[Dict[str, Any]]) -> Dict[str, List[str]]:
    """End-to-end E1+E3 over a pages corpus at the schema-pass chunk params
    (1200/200 — the coarse first pass of the reference's two-pass chunking,
    ref :811 vs :825). This is the plain-Python oracle the Spark stage
    (operators/schema_detect.py) is tested against."""
    proposals: List[Dict[str, List[str]]] = []
    for row in pages:
        if row.get("lang") not in SUPPORTED_LANGS:
            continue
        text = row.get("text")
        if text is None:
            text = html_to_text(row.get("html"))
        for _cid, ctext, _cs, _ce in chunk_text(
                text, SCHEMA_CHUNK_SIZE, SCHEMA_CHUNK_OVERLAP):
            proposals.append(propose_chunk_schema(ctext))
    return refine_schema(proposals)


# ---------------------------------------------------------------------------
# N1-N8: build_graph_document — the exact convert_to_graph_document pipeline
# (ref: code/pdf_graphrag.py:393-500) as a pure function.
# ---------------------------------------------------------------------------


def build_graph_document(
    data: Dict[str, List[Dict[str, Any]]],
    chunk_index: int,
    chunk_text_value: str,
    page: int = 0,
    with_embedding: bool = True,
) -> Dict[str, List[Dict[str, Any]]]:
    """Normalize raw extraction into a graph-document dict.

    Returns {"nodes": [{id,type,properties}], "edges": [{subj, subj_type,
    pred, obj, obj_type, properties}]}. Mirrors, step for step:
      * invalid-node drop         ref :421-424
      * type capitalize/default   ref :427
      * camelCase property keys   ref :429-434
      * id .title() (non-digit)   ref :437-439
      * invalid-edge drop         ref :454-456
      * case-insensitive endpoint resolution within the chunk  ref :459-468
        (reference is an O(V*E) list scan; here an O(V+E) dict — same result)
      * chunk node {text, embedding, page}  ref :406-417
      * HAS edge chunk→every extracted node ref :484-492
    """
    out_nodes: List[Dict[str, Any]] = []
    by_lower: Dict[str, Dict[str, Any]] = {}

    for node_data in data.get("nodes", []):
        node_id = node_data.get("id")
        if not node_id or not str(node_id).strip():
            continue
        node_type = format_node_type(node_data.get("label") or node_data.get("type"))
        raw_props = node_data.get("properties") or {}
        props = {format_property_key(k): str(v) for k, v in raw_props.items()}
        normalized_id = normalize_node_id(node_id)
        node = {"id": normalized_id, "type": node_type, "properties": props}
        out_nodes.append(node)
        # first match wins, like the reference's next((n for n in nodes ...))
        by_lower.setdefault(normalized_id.lower(), node)

    out_edges: List[Dict[str, Any]] = []
    for rel in data.get("relationships", []):
        source_id = rel.get("source_node_id")
        target_id = rel.get("target_node_id")
        rel_type = rel.get("relation") or rel.get("type")
        if not source_id or not target_id or not rel_type:
            continue
        src = by_lower.get(str(source_id).strip().lower())
        tgt = by_lower.get(str(target_id).strip().lower())
        if src is None or tgt is None:
            # NOTE: the reference resolves against *raw* node ids case-
            # insensitively; raw ids and normalized ids differ only by
            # .title(), which is case-insensitive-equal, so lookups match.
            src = by_lower.get(normalize_node_id(source_id).lower())
            tgt = by_lower.get(normalize_node_id(target_id).lower())
        if src and tgt:
            raw_props = rel.get("properties") or {}
            props = {format_property_key(k): str(v) for k, v in raw_props.items()}
            out_edges.append({
                "subj": src["id"], "subj_type": src["type"],
                "pred": format_relationship_type(rel_type),
                "obj": tgt["id"], "obj_type": tgt["type"],
                "properties": props,
            })

    chunk_node_id = f"chunk_{chunk_index}"
    chunk_props: Dict[str, Any] = {"text": chunk_text_value, "page": str(page)}
    if with_embedding:
        chunk_props["embedding"] = ",".join(
            f"{x:.6f}" for x in embed_text(chunk_text_value)
        )
    for node in out_nodes:
        out_edges.append({
            "subj": chunk_node_id, "subj_type": "Chunk",
            "pred": "HAS",
            "obj": node["id"], "obj_type": node["type"],
            "properties": {},
        })
    out_nodes.append({"id": chunk_node_id, "type": "Chunk", "properties": chunk_props})
    return {"nodes": out_nodes, "edges": out_edges}


# ---------------------------------------------------------------------------
# N9: strict-mode filter (ref: code/pdf_graphrag.py:509-564)
# ---------------------------------------------------------------------------


def strict_mode_filter(
    graph_doc: Dict[str, List[Dict[str, Any]]],
    allowed_entities: Optional[List[str]],
    allowed_relationships: Optional[List[str]],
) -> Dict[str, List[Dict[str, Any]]]:
    """Keep nodes whose type ∈ allowed (Chunk always kept, ref :539-541);
    drop edges touching dropped nodes; keep rels whose pred ∈ allowed
    (HAS always kept, ref :555-557). A None list means UNRESTRICTED for
    that dimension (the config's two Optionals are independent) — an
    empty list genuinely restricts to nothing."""
    allowed_n = None if allowed_entities is None else set(allowed_entities)
    keep_nodes = [n for n in graph_doc["nodes"]
                  if n["type"] == "Chunk"
                  or allowed_n is None or n["type"] in allowed_n]
    kept_ids = {n["id"] for n in keep_nodes}
    allowed_r = (None if allowed_relationships is None
                 else set(allowed_relationships))
    keep_edges = [e for e in graph_doc["edges"]
                  if (e["pred"] == "HAS"
                      or allowed_r is None or e["pred"] in allowed_r)
                  and e["subj"] in kept_ids and e["obj"] in kept_ids]
    return {"nodes": keep_nodes, "edges": keep_edges}


# ---------------------------------------------------------------------------
# End-to-end plain-Python pipeline over a pages corpus → golden triples.
# This is what pytest compares the Spark pipeline against (P/R = 1.0).
# ---------------------------------------------------------------------------

SUPPORTED_LANGS = ("en",)


def reference_pipeline(
    pages: List[Dict[str, Any]],
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    with_embedding: bool = False,
) -> Dict[str, List[Dict[str, Any]]]:
    """pages: [{url, html(bytes|None), text(str|None), lang}] → {nodes, edges}
    with per-row lineage (url, chunk_id) on every edge, pre-entity-linking
    (exact (type,id) dedup only — the reference's MERGE semantics,
    code/pdf_graphrag.py:277-300).

    Property-merge semantics (round-3 fix): the reference applies
    ``MERGE ... SET n += props`` / ``SET r += props`` once PER OCCURRENCE
    (code/pdf_graphrag.py:287-296) — last-writer-wins per property key —
    and the engine's documented ingestion order is sorted
    (url, chunk_id, occ), where ``occ`` is the emission ordinal within
    the chunk's node/edge list (operators/merge.py max_by; the ordinal
    breaks ties when ONE chunk emits the same key twice with conflicting
    values — Spark's max_by is nondeterministic on order ties). The
    oracle therefore collects every occurrence and replays the property
    updates in sorted (url, chunk_id, occ) order, for NODES and EDGES
    alike. The old oracle deduped edges first-wins and silently dropped
    later occurrences' properties, diverging from both the reference and
    the engine (e.g. a later ``since 2009`` mention never reached the
    merged edge). Lineage is the first witness: min (url, chunk_id) over
    occurrences, matching merge.py's ``min(struct(url, chunk_id))``.
    """
    # key -> ordered list of (url, chunk_id, occ, properties) occurrences
    node_occ: Dict[Tuple[str, str],
                   List[Tuple[str, int, int, Dict[str, Any]]]] = {}
    edge_occ: Dict[Tuple[str, str, str, str, str],
                   List[Tuple[str, int, int, Dict[str, Any]]]] = {}
    for row in pages:
        if row.get("lang") not in SUPPORTED_LANGS:
            continue
        text = row.get("text")
        if text is None:
            text = html_to_text(row.get("html"))
        for cid, ctext, _cs, _ce in chunk_text(text, chunk_size, overlap):
            raw = extract_chunk(ctext)
            gd = build_graph_document(raw, cid, ctext, page=0,
                                      with_embedding=with_embedding)
            url = row["url"]
            for occ, n in enumerate(gd["nodes"]):
                nid = f"{url}#chunk_{cid}" if n["type"] == "Chunk" else n["id"]
                node_occ.setdefault((n["type"], nid), []).append(
                    (url, cid, occ, n["properties"]))
            for occ, e in enumerate(gd["edges"]):
                subj = f"{url}#{e['subj']}" if e["subj_type"] == "Chunk" else e["subj"]
                ekey = (subj, e["subj_type"], e["pred"], e["obj"], e["obj_type"])
                edge_occ.setdefault(ekey, []).append(
                    (url, cid, occ, e["properties"]))

    def _merge(occs: List[Tuple[str, int, int, Dict[str, Any]]]):
        """Last-writer-wins property replay in sorted (url, chunk_id, occ)
        order + first-witness lineage (the min occurrence)."""
        ordered = sorted(occs, key=lambda t: (t[0], t[1], t[2]))
        props: Dict[str, Any] = {}
        for _u, _c, _o, p in ordered:
            props.update(p)
        return props, ordered[0][0], ordered[0][1]

    all_nodes: List[Dict[str, Any]] = []
    for (ntype, nid), occs in node_occ.items():
        props, _url, _cid = _merge(occs)
        all_nodes.append({"id": nid, "type": ntype, "properties": props})
    all_edges: List[Dict[str, Any]] = []
    for (subj, subj_type, pred, obj, obj_type), occs in edge_occ.items():
        props, url, cid = _merge(occs)
        all_edges.append({
            "subj": subj, "subj_type": subj_type, "pred": pred,
            "obj": obj, "obj_type": obj_type, "properties": props,
            "url": url, "chunk_id": cid,
        })
    return {"nodes": all_nodes, "edges": all_edges}
