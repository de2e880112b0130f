"""Fact fusion (operators/fusion.py): support counts, majority property
election with deterministic tie-breaks, and conflict counting — checked
against a plain-Python twin on a hand-built occurrence table."""

from __future__ import annotations

import pytest

from collections import Counter


ROWS = [
    # (subj, subj_type, pred, obj, obj_type, props, url)
    ("John", "Person", "WORKS_FOR", "Acme", "Org", {"since": "2009"}, "u1"),
    ("John", "Person", "WORKS_FOR", "Acme", "Org", {"since": "2011"}, "u2"),
    ("John", "Person", "WORKS_FOR", "Acme", "Org", {"since": "2011"}, "u3"),
    ("John", "Person", "WORKS_FOR", "Acme", "Org", {}, "u3"),
    ("Ada", "Person", "FOUNDED", "Beta", "Org",
     {"year": "1999", "city": "Oslo"}, "u1"),
    ("Ada", "Person", "FOUNDED", "Beta", "Org",
     {"year": "2001", "city": "Oslo"}, "u1"),
    ("Solo", "Person", "KNOWS", "Hermit", "Person", {}, "u9"),
]


def _df(spark):
    from pyspark.sql import functions as F
    return spark.createDataFrame(
        [(s, st, p, o, ot, pr, u) for s, st, p, o, ot, pr, u in ROWS],
        "subj string, subj_type string, pred string, obj string, "
        "obj_type string, properties map<string,string>, url string")


def py_fuse(rows):
    out = {}
    for s, st, p, o, ot, pr, u in rows:
        k = (s, st, p, o, ot)
        d = out.setdefault(k, {"m": 0, "urls": set(), "kv": Counter()})
        d["m"] += 1
        d["urls"].add(u)
        for pk, pv in pr.items():
            d["kv"][(pk, pv)] += 1
    res = {}
    for k, d in out.items():
        elected, conflicts = {}, 0
        by_key = {}
        for (pk, pv), n in d["kv"].items():
            by_key.setdefault(pk, []).append((n, pv))
        for pk, lst in by_key.items():
            top = max(n for n, _ in lst)
            elected[pk] = min(pv for n, pv in lst if n == top)
            if len({pv for _, pv in lst}) > 1:
                conflicts += 1
        res[k] = (d["m"], len(d["urls"]), elected, conflicts)
    return res


@pytest.mark.heavy
def test_fusion_matches_python_twin(spark):
    from llm_knowledge_graph_spark.operators.fusion import fuse_edges
    got = {(r.subj, r.subj_type, r.pred, r.obj, r.obj_type):
           (r.n_mentions, r.n_urls, dict(r.properties), r.n_conflicts)
           for r in fuse_edges(_df(spark)).collect()}
    assert got == py_fuse(ROWS)


def test_fusion_election_details(spark):
    from llm_knowledge_graph_spark.operators.fusion import fuse_edges
    got = {(r.subj, r.pred): r for r in fuse_edges(_df(spark)).collect()}
    j = got[("John", "WORKS_FOR")]
    # majority: 'since'=2011 seen twice beats 2009 once; empty-prop
    # occurrence still counts as a mention
    assert j.n_mentions == 4 and j.n_urls == 3
    assert dict(j.properties) == {"since": "2011"} and j.n_conflicts == 1
    a = got[("Ada", "FOUNDED")]
    # tie on 'year' (1999 x1 vs 2001 x1) -> lexicographically smallest;
    # 'city' agrees -> not a conflict
    assert dict(a.properties) == {"year": "1999", "city": "Oslo"}
    assert a.n_conflicts == 1 and a.n_urls == 1
    s = got[("Solo", "KNOWS")]
    # no properties at all -> empty map, zero conflicts
    assert dict(s.properties) == {} and s.n_conflicts == 0


@pytest.mark.heavy
def test_fusion_on_pipeline_corpus(spark):
    """End-to-end: fuse the extractor's occurrence edges from the fixture
    corpus; support totals must reconcile with occurrence rows."""
    from llm_knowledge_graph_spark.operators import extract
    from llm_knowledge_graph_spark.operators.fusion import fuse_edges
    from llm_knowledge_graph_spark.sources.pages import synthesize_pages
    from pyspark.sql import functions as F
    pages = synthesize_pages(spark, 60, seed=42)
    flat = extract.extract_pages_flat(pages).localCheckpoint()
    edges_raw = extract.edges_from_flat(flat)
    fused = fuse_edges(edges_raw)
    assert fused.agg(F.sum("n_mentions")).collect()[0][0] \
        == edges_raw.count()
    # fused keys are unique
    assert fused.count() == fused.select(
        "subj", "subj_type", "pred", "obj", "obj_type").distinct().count()


@pytest.mark.heavy
def test_fusion_state_folds_exactly(spark):
    """Incremental form: fusion_answer(fusion_fold(state(A) ∪ state(B)))
    must equal fuse_edges(A ∪ B) — including the lossy case where the
    same (key, url) carries DIFFERENT property sets across batches."""
    from llm_knowledge_graph_spark.operators.fusion import (
        fuse_edges, fusion_answer, fusion_fold, fusion_state)
    schema = ("subj string, subj_type string, pred string, obj string, "
              "obj_type string, properties map<string,string>, url string")
    batch_a = spark.createDataFrame(ROWS[:3], schema)
    batch_b = spark.createDataFrame(ROWS[3:], schema)
    folded = fusion_fold(
        fusion_state(batch_a).unionByName(fusion_state(batch_b)))
    got = {(r.subj, r.subj_type, r.pred, r.obj, r.obj_type):
           (r.n_mentions, r.n_urls, dict(r.properties), r.n_conflicts)
           for r in fusion_answer(folded).collect()}
    want = {(r.subj, r.subj_type, r.pred, r.obj, r.obj_type):
            (r.n_mentions, r.n_urls, dict(r.properties), r.n_conflicts)
            for r in fuse_edges(_df(spark)).collect()}
    assert got == want
    # the John/u3 url carries one {since} occurrence AND one bare
    # occurrence split across batches — the marker rows keep the
    # mention count exact (4), where property-row-derived counts lose it
    assert got[("John", "Person", "WORKS_FOR", "Acme", "Org")][0] == 4
