"""The in-query ANN planted-neighbor recall gate (round 4) must actually
fire: a degraded ANN path that misses the planted near-neighbors raises,
and the healthy LSH/IVF paths pass it on the sf0.001 embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_and_query(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = e.filter(F.col("vec_id") == 0).first().embedding
    return e.filter(F.col("vec_id") != 0), qvec


@pytest.mark.heavy
def test_gate_raises_on_degraded_ann(spark, corpus_and_query):
    from llm_knowledge_graph_spark.plans.kg_queries import \
        _assert_planted_ann_recall
    corpus, qvec = corpus_and_query

    def blind_ann(union):           # degraded: never returns planted ids
        return (union.filter(F.col("vec_id") < 9000000)
                .select("vec_id").limit(10))

    with pytest.raises(AssertionError, match="planted-neighbor recall"):
        _assert_planted_ann_recall(spark, corpus, qvec, blind_ann,
                                   label="degraded")


@pytest.mark.heavy
def test_gate_passes_on_healthy_paths(spark, corpus_and_query):
    from llm_knowledge_graph_spark.operators.similarity import (ivf_ann_topk,
                                                                lsh_ann_topk)
    from llm_knowledge_graph_spark.plans.kg_queries import \
        _assert_planted_ann_recall
    corpus, qvec = corpus_and_query
    _assert_planted_ann_recall(
        spark, corpus, qvec, lambda u: lsh_ann_topk(u, qvec, k=10),
        label="lsh")
    _assert_planted_ann_recall(
        spark, corpus, qvec,
        lambda u: ivf_ann_topk(u, qvec, k=10, n_centroids=16, n_probe=4),
        label="ivf")
