"""Unit tests: chunker determinism/coverage and the deterministic extractor
(regex semantics lifted from code/legal-llm/legal_graphrag.py:204-228 and the
SVO shape of code/pdf_graphrag.py:101-128)."""

from llm_knowledge_graph_spark.reference_impl import (
    build_graph_document,
    chunk_text,
    extract_chunk,
    strict_mode_filter,
)


def test_chunker_determinism_and_coverage():
    text = " ".join(f"word{i}" for i in range(500))
    chunks = chunk_text(text, 128, 32)
    assert chunks == chunk_text(text, 128, 32)
    # every chunk respects the size bound and chunk ids are sequential
    for cid, (i, c, s, e) in enumerate(chunks):
        assert i == cid
        assert len(c) <= 128
        assert text[s:e].strip() == c
    # full coverage: every character of the source appears in some chunk
    covered = set()
    for _, _, s, e in chunks:
        covered.update(range(s, e))
    assert covered == set(range(len(text)))


def test_chunker_small_text_single_chunk():
    assert chunk_text("hello world", 1024, 128) == [(0, "hello world", 0, 11)]
    assert chunk_text("", 1024, 128) == []


def test_svo_extraction():
    raw = extract_chunk("John Doe works for Acme Corp since 1998. "
                        "Globex Inc acquired Initech Ltd.")
    rels = {(r["source_node_id"], r["relation"], r["target_node_id"])
            for r in raw["relationships"]}
    assert ("John Doe", "works for", "Acme Corp") in rels
    assert ("Globex Inc", "acquired", "Initech Ltd") in rels
    since = [r for r in raw["relationships"] if r["relation"] == "works for"]
    assert since[0]["properties"] == {"since year": "1998"}
    types = {n["id"]: n["type"] for n in raw["nodes"]}
    assert types["John Doe"] == "person"
    assert types["Acme Corp"] == "organization"


def test_sentence_scoping_no_cross_boundary_names():
    # a name must not slurp the next sentence's leading name
    raw = extract_chunk("Alice Chen loves Peter Kim. Globex Inc sued Hooli Inc.")
    ids = {n["id"] for n in raw["nodes"]}
    assert ids == {"Alice Chen", "Peter Kim", "Globex Inc", "Hooli Inc"}


def test_definition_and_section_extraction():
    raw = extract_chunk('"Agreement" means the binding contract. '
                        "Section 12: General Provisions\n§ 12 cites § 7.")
    by_id = {n["id"]: n for n in raw["nodes"]}
    assert by_id["Agreement"]["type"] == "term"
    assert "binding contract" in by_id["Agreement"]["properties"]["definition text"]
    assert by_id["§ 12"]["type"] == "section"
    rels = {(r["source_node_id"], r["relation"], r["target_node_id"])
            for r in raw["relationships"]}
    assert ("§ 12", "cites", "§ 7") in rels


def test_filler_extracts_nothing():
    raw = extract_chunk("the quick brown fox jumps over the lazy dog.")
    assert raw["nodes"] == [] and raw["relationships"] == []


def test_build_graph_document_normalization_and_has_edges():
    raw = {
        "nodes": [
            {"id": "john doe", "type": "person", "properties": {"first name": "john"}},
            {"id": "  ", "type": "x"},            # dropped: blank id (ref :421-424)
            {"id": "acme corp", "type": ""},      # type -> Entity (ref :427, :27)
        ],
        "relationships": [
            {"source_node_id": "JOHN DOE", "target_node_id": "ACME CORP",
             "relation": "works for"},            # case-insensitive endpoints
            {"source_node_id": "john doe", "target_node_id": "ghost",
             "relation": "knows"},                # dropped: dangling target
            {"source_node_id": "john doe", "target_node_id": "acme corp",
             "relation": None},                   # dropped: missing type
        ],
    }
    gd = build_graph_document(raw, 3, "chunk text here", with_embedding=False)
    ids = {n["id"]: n for n in gd["nodes"]}
    assert set(ids) == {"John Doe", "Acme Corp", "chunk_3"}
    assert ids["John Doe"]["properties"] == {"firstName": "john"}
    assert ids["Acme Corp"]["type"] == "Entity"
    triples = {(e["subj"], e["pred"], e["obj"]) for e in gd["edges"]}
    assert ("John Doe", "WORKS_FOR", "Acme Corp") in triples
    # HAS edge per extracted node (ref :484-492), none for the chunk itself
    has = [e for e in gd["edges"] if e["pred"] == "HAS"]
    assert {(e["subj"], e["obj"]) for e in has} == {
        ("chunk_3", "John Doe"), ("chunk_3", "Acme Corp")}
    assert len(gd["edges"]) == 3


def test_strict_mode_filter_chunk_and_has_exempt():
    gd = {
        "nodes": [
            {"id": "A", "type": "Person", "properties": {}},
            {"id": "B", "type": "Widget", "properties": {}},
            {"id": "chunk_0", "type": "Chunk", "properties": {}},
        ],
        "edges": [
            {"subj": "A", "subj_type": "Person", "pred": "LOVES",
             "obj": "B", "obj_type": "Widget", "properties": {}},
            {"subj": "chunk_0", "subj_type": "Chunk", "pred": "HAS",
             "obj": "A", "obj_type": "Person", "properties": {}},
            {"subj": "chunk_0", "subj_type": "Chunk", "pred": "HAS",
             "obj": "B", "obj_type": "Widget", "properties": {}},
        ],
    }
    out = strict_mode_filter(gd, ["Person"], ["LOVES"])
    # Widget dropped; Chunk kept (ref :539-541); HAS kept only to kept nodes
    assert {n["id"] for n in out["nodes"]} == {"A", "chunk_0"}
    assert {(e["subj"], e["pred"], e["obj"]) for e in out["edges"]} == {
        ("chunk_0", "HAS", "A")}
