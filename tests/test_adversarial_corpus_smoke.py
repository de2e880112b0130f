"""Adversarial-corpus smoke: every documents-only driver query must run
(not crash) on a corpus of edge-case docs — empty text, single-word and
two-word docs (below every shingle n), a 500-char single token, unicode
tokens, punctuation runs, and heavy repetition.

This is the test class that catches expression-totality bugs the happy-
path corpus can't: the round-4 descending-sequence crash (a 2-token doc
at n=3 under Catalyst's InferFiltersFromGenerate) only manifests on
docs shorter than the gram width, and the sf testdata has none."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.heavy  # round-5 core/heavy split


# every SQL_QUERIES entry whose only table is `documents`
DOC_ONLY_QUERIES = [
    "doc_lang_counts", "doc_token_stats", "doc_exact_dedup",
    "doc_stopword_ratio", "word_cooccurrence", "doc_fingerprint",
    "ngram_jaccard_pairs", "doc_lang_id", "doc_quality",
    "doc_regex_tokens", "doc_winnow_fingerprint", "doc_classification",
    "doc_taxonomy_classification", "word_pagerank",
    "doc_repetition_stats", "doc_decontamination", "doc_train_split",
    "word_graph_stats", "doc_length_quantiles", "word_bfs_distances",
    "doc_shingle_components", "doc_pii_redaction",
    "word_link_prediction", "doc_dup_span_mass", "doc_dup_span_removal",
    "doc_filter_funnel", "doc_pack_bins", "lang_temperature_weights",
    "doc_stratified_sample", "bpe_compression", "lang_distinct_hll",
    "word_cms_topk", "doc_blocklist_bloom", "doc_bm25_topk",
    "url_dup_stats", "doc_surprisal_topk", "domain_cap_rollup",
    "quality_threshold_sweep", "dup_cluster_histogram",
    "doc_paragraph_dedup", "vocab_growth", "zipf_band_histogram",
    "word_kcore", "crawl_snapshot_diff", "word_ppr_topk",
    "doc_length_hist_quantiles", "word_negative_samples",
    "doc_containment_pairs", "word_degree_salted", "doc_novelty_scores",
    "doc_backoff_lm", "word_communities",
]

_EDGE_DOCS = [
    (0, "", "en", "src0"),                           # empty text
    (1, "solo", "en", "src0"),                       # 1 token
    (2, "two words", "de", "src1"),                  # 2 tokens (< n=3..8)
    (3, "x " * 3 + "x", "fr", "src1"),               # 4 repeated tokens
    (4, "w" * 500, "es", "src2"),                    # one 500-char token
    (5, "中文 字符 éé üü ß 中文 字符", "en", "src2"),  # unicode tokens
    (6, "a.b,c;d:e!f?g (h) [i] {j}", "de", "src3"),  # punctuation run
    (7, "the of and to is a " * 8, "en", "src3"),    # stopword soup
    (8, "pack my box with five dozen liquor jugs extra tail words "
        "to clear every shingle width in the suite", "en", "src4"),
    (9, ("repeat me " * 12).strip(), "fr", "src4"),  # heavy repetition
    (10, "the quick brown fox jumps over the lazy dog again and again "
         "with enough words for eight gram shingles", "en", "src5"),
    (11, "the quick brown fox jumps over the lazy dog again and again "
         "with enough words for eight gram shingles", "es", "src5"),
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("edge_sf")
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in _EDGE_DOCS]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out / "documents.parquet"))
    return str(out)


@pytest.mark.parametrize("name", DOC_ONLY_QUERIES)
def test_doc_query_survives_edge_corpus(spark, edge_sf_dir, name):
    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    rows = SQL_QUERIES[name](spark, edge_sf_dir).collect()
    assert isinstance(rows, list)       # ran to completion, any row count


# every SQL_QUERIES entry whose only table is `events` (streaming
# variants included — their batch-source path reads the same parquet)
EVENTS_ONLY_QUERIES = [
    "events_latest_per_user", "events_type_stats", "user_sessions",
    "user_session_windows", "events_stream_sessions",
    "events_json_extract", "events_hourly_stream_counts",
    "events_asof_purchase", "events_range_join", "events_hopping_counts",
    "events_funnel", "events_zorder_pruning", "events_stream_enriched",
    "events_hour_type_pivot",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    """Edge events: a single user, simultaneous timestamps, empty and
    malformed JSON props, zero/negative values, an event type outside
    every pinned vocabulary, and one lone user with one event."""
    import datetime as dt
    out = tmp_path_factory.mktemp("edge_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0, 1, "view", -5.0, ""),               # simultaneous + empty
        (2, t0, 1, "purchase", 0.0, "not json"),     # malformed props
        (3, t0 + dt.timedelta(hours=2), 1, "weird_type", 1.5,
         '{"k": null}'),
        (4, t0 + dt.timedelta(hours=2, seconds=1), 2, "click", 2.5,
         '{"device": "m"}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out / "events.parquet"))
    return str(out)


@pytest.mark.parametrize("name", EVENTS_ONLY_QUERIES)
def test_events_query_survives_edge_corpus(spark, edge_events_dir, name):
    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    rows = SQL_QUERIES[name](spark, edge_events_dir).collect()
    assert isinstance(rows, list)


# every SQL_QUERIES entry whose only table is `embeddings`
EMBEDDINGS_ONLY_QUERIES = [
    "cosine_topk", "cosine_near_dup_pairs", "knn_join",
    "label_centroid_norms", "doc_semantic_dedup", "cosine_topk_sq8",
]


@pytest.fixture(scope="module")
def edge_embeddings_dir(spark, tmp_path_factory):
    """Edge vectors: the all-zero vector (norm 0), exact duplicates,
    tiny and huge magnitudes, negative-only components — the inputs
    that break unguarded norm divisions and quantization."""
    out = tmp_path_factory.mktemp("edge_emb")
    dim = 8
    vecs = [
        (0, [0.0] * dim, 0),                      # zero vector
        (1, [1.0] + [0.0] * (dim - 1), 0),
        (2, [1.0] + [0.0] * (dim - 1), 1),        # exact duplicate of 1
        (3, [1e-30] * dim, 1),                    # underflow-tiny
        # huge mixed-sign, but inside label_centroid_norms' documented
        # micro-unit domain (|v| < ~9.2e12); the out-of-domain loud
        # failure is pinned separately below
        (4, [1e6, -1e6] * (dim // 2), 2),
        (5, [-1.0] * dim, 2),                     # negative-only
        (6, [float(i) for i in range(dim)], 3),
        (7, [float(dim - i) for i in range(dim)], 3),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet"))
    return str(out)


@pytest.mark.parametrize("name", EMBEDDINGS_ONLY_QUERIES)
def test_embeddings_query_survives_edge_corpus(spark, edge_embeddings_dir,
                                               name):
    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    rows = SQL_QUERIES[name](spark, edge_embeddings_dir).collect()
    assert isinstance(rows, list)


def test_centroid_norms_fails_loudly_outside_microunit_domain(
        spark, tmp_path):
    """label_centroid_norms' exactness contract (integer micro-units)
    cannot represent |v| >= ~9.2e12 — such input must fail LOUDLY
    (ANSI cast overflow), never silently clamp."""
    from pyspark.errors.exceptions.captured import ArithmeticException

    from llm_knowledge_graph_spark.plans.driver_queries import SQL_QUERIES
    df = spark.createDataFrame(
        [(0, [1e30] * 4, 0)], "vec_id long, embedding array<float>, "
                              "label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    with pytest.raises(ArithmeticException, match="CAST_OVERFLOW"):
        SQL_QUERIES["label_centroid_norms"](spark, str(tmp_path)).collect()
