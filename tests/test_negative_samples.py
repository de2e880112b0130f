"""word_negative_samples: clean-negative invariants on the real fixture
— no sampled negative may be the head, the true tail, or form a true
edge with the head; and the hash sampler is deterministic."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.heavy
def test_negative_sample_invariants(spark):
    from llm_knowledge_graph_spark.plans.driver_queries import (
        SQL_QUERIES, _word_edges, _t)
    rows = SQL_QUERIES["word_negative_samples"](spark, SF_DIR).collect()
    assert rows, "sampler produced no negatives on the fixture"
    true_edges = {(r.src, r.dst) for r in
                  _word_edges(_t(spark, SF_DIR, "documents")).collect()}
    for r in rows:
        assert r.neg != r.src and r.neg != r.dst
        assert (r.src, r.neg) not in true_edges
        assert (r.src, r.dst) in true_edges        # positives are real
    again = SQL_QUERIES["word_negative_samples"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
