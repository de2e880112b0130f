"""Tests for training-data-pipeline operators: dedup family, similarity
search, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
        (3, "a completely different document about spark pipelines"),
        (4, "spark pipelines process data at scale every day"),
        (5, "the quick brown fox jumps over the lazy dog today"),    # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    from llm_knowledge_graph_spark.operators.dedup import (exact_dedup,
                                                           exact_dedup_stats)
    stats = exact_dedup_stats(docs, "text").first()
    assert stats.n_docs == 6 and stats.n_distinct_texts == 5
    assert stats.n_dup_docs == 1
    kept = exact_dedup(docs, "doc_id", "text")
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {0, 2, 3, 4, 5}  # min doc_id representative survives


@pytest.mark.heavy
def test_minhash_lsh_near_dups(docs):
    from llm_knowledge_graph_spark.operators.dedup import minhash_lsh_near_dups
    pairs = {(r.a, r.b) for r in
             minhash_lsh_near_dups(docs, "doc_id", "text",
                                   shingle_words=2,
                                   jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs          # exact dup always found
    assert (0, 5) in pairs or (1, 5) in pairs  # near dup found
    assert not any(a == 3 or b == 3 for a, b in pairs)  # unrelated not linked


@pytest.mark.heavy
def test_ngram_jaccard_exact_values(docs):
    from llm_knowledge_graph_spark.operators.dedup import ngram_jaccard_pairs
    got = {(r.a, r.b): r.jaccard for r in
           ngram_jaccard_pairs(docs, "doc_id", "text", n=2,
                               threshold=0.4).collect()}
    assert got[(0, 1)] == 1.0


@pytest.mark.heavy
def test_simhash_near_dups(docs):
    from llm_knowledge_graph_spark.operators.dedup import simhash_near_dups
    pairs = {(r.a, r.b): r.hamming for r in
             simhash_near_dups(docs, "doc_id", "text",
                               max_hamming=16).collect()}
    assert pairs.get((0, 1)) == 0   # identical text → identical simhash
    assert (0, 2) in pairs          # one-word change → small hamming


def test_brute_force_topk_and_lsh_ann(spark):
    from llm_knowledge_graph_spark.operators.similarity import (
        brute_force_topk, lsh_ann_topk)
    import math
    dim = 8
    rows = []
    for i in range(50):
        v = [math.sin(0.1 * i * (d + 1)) for d in range(dim)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[7][1]
    top = brute_force_topk(df.filter(F.col("vec_id") != 7), q, k=5)
    got = [r.vec_id for r in top.collect()]
    assert len(got) == 5
    # vectors adjacent in i are most similar under this construction
    assert got[0] in (6, 8)
    ann = lsh_ann_topk(df.filter(F.col("vec_id") != 7), q, k=5)
    ann_ids = [r.vec_id for r in ann.collect()]
    assert 0 < len(ann_ids) <= 5
    # ANN results are genuinely similar: majority from the brute-force
    # top-15 on this toy 8-d set (recall isn't 1.0 by design here; the
    # ≥0.9 recall bound lives in test_lsh_ann_topk_recall on the planted
    # fixture, where ANN recall is actually meaningful)
    brute15 = {r.vec_id for r in
               brute_force_topk(df.filter(F.col("vec_id") != 7), q, 15).collect()}
    assert len(set(ann_ids) & brute15) >= 3


@pytest.mark.heavy
def test_knn_join_rank_contract(spark):
    from llm_knowledge_graph_spark.operators.similarity import knn_join
    rows = [(i, [float(i == d) for d in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = knn_join(df, df.filter(F.col("vec_id") < 2), k=2)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.qid, []).append(r.rank)
    assert all(sorted(v) == [1, 2] for v in per_q.values())


def test_multimodal_feature_plumbing(spark):
    from llm_knowledge_graph_spark.operators.multimodal import (
        extract_features, synthesize_media)
    media = synthesize_media(spark, n=30)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feature) == 16
        assert r.n_bytes > 0
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in
             extract_features(media, fake=True).collect()}
    for r in rows:
        assert again[r.media_id] == r.feature


def test_multimodal_real_decode_rejects_opaque_payloads(spark):
    """fake=False is REAL now (round 4): non-PNG/PPM image payloads must
    fail loudly inside the UDF, never fabricate features."""
    from pyspark.errors.exceptions.captured import PythonException

    from llm_knowledge_graph_spark.operators.multimodal import (
        extract_features, synthesize_media)
    with pytest.raises(PythonException, match="stdlib decode path"):
        extract_features(synthesize_media(spark, n=3), fake=False).collect()


@pytest.mark.heavy
def test_lsh_cosine_near_dup_recall_on_exact_dups(spark):
    """Exact-duplicate vectors share every LSH table bucket — recall 1.0
    by construction; exact cosine verify scores them 1.0."""
    from llm_knowledge_graph_spark.operators.similarity import (
        lsh_cosine_near_dup_pairs)
    from pyspark.sql import functions as F
    e = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
         .filter(F.col("vec_id") < 50).select("vec_id", "embedding"))
    planted = e.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    pairs = {(r.a, r.b): r.score for r in lsh_cosine_near_dup_pairs(
        e.unionByName(planted), threshold=0.99).collect()}
    for i in range(50):
        assert pairs.get((i, i + 1000)) == 1.0


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    """Clustered ANN fixture: 400 random base vectors + 10 planted near
    neighbors (cosine ≈ 0.95+) around each of 3 query vectors. Random
    high-dim data has NO sublinear-recallable structure (the driver's
    embeddings table is ~uniform: top-10 cosine ≈ 0.37), so recall bounds
    are asserted on planted structure — the regime ANN indexes exist for."""
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(400, 64)
    rows = []
    vid = 1000
    for i in range(len(base)):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
    queries = {}
    for q in range(3):
        qv = rng.randn(64)
        queries[q] = [float(x) for x in qv]
        for _ in range(10):
            nb = qv + 0.18 * rng.randn(64)   # cosine(qv, nb) ≈ 0.95
            rows.append((vid, [float(x) for x in nb])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, queries


def _recall(approx_df, truth_df):
    a = {r.vec_id for r in approx_df.collect()}
    t = {r.vec_id for r in truth_df.collect()}
    return len(a & t) / len(t)


@pytest.mark.heavy
def test_lsh_ann_topk_recall(planted_embeddings):
    """Multi-table LSH top-k must recall ≥ 0.9 of the true top-10 on the
    planted fixture (single-table single-probe — the round-1 design —
    measures ~0.5 here)."""
    from llm_knowledge_graph_spark.operators.similarity import (
        brute_force_topk, lsh_ann_topk)
    df, queries = planted_embeddings
    recalls = []
    for qvec in queries.values():
        truth = brute_force_topk(df, qvec, k=10)
        approx = lsh_ann_topk(df, qvec, k=10, n_planes=6, n_tables=4)
        recalls.append(_recall(approx, truth))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


@pytest.mark.heavy
def test_ivf_ann_topk_recall(planted_embeddings):
    """k-means-trained IVF with 4/16 probes must recall ≥ 0.9 of the true
    top-10 on the planted fixture."""
    from llm_knowledge_graph_spark.operators.similarity import (
        brute_force_topk, ivf_ann_topk)
    df, queries = planted_embeddings
    recalls = []
    for qvec in queries.values():
        truth = brute_force_topk(df, qvec, k=10)
        approx = ivf_ann_topk(df, qvec, k=10, n_centroids=16, n_probe=4)
        recalls.append(_recall(approx, truth))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


@pytest.mark.heavy
def test_ivf_training_sample_is_id_blind(spark):
    """Round-3 regression: ids correlate with cluster (crawl order ≈ site ≈
    topic) — ids 0-999 are cluster A, 1000-1999 cluster B, and the training
    sample (1000 rows) is HALF the corpus. The old orderBy(id).limit()
    sample saw only cluster A, so no trained centroid pointed at B; the
    xxhash64(id)-ordered sample is distribution-blind and must place
    centroids in BOTH clusters. Recall on a B-cluster query must hold too."""
    import math

    import numpy as np

    from llm_knowledge_graph_spark.operators.similarity import (
        brute_force_topk, ivf_ann_topk, train_ivf_centroids)
    rng = np.random.RandomState(11)
    a_center, b_center = rng.randn(64), rng.randn(64)
    rows = []
    for i in range(1000):
        rows.append((i, [float(x) for x in a_center + 0.15 * rng.randn(64)]))
    for i in range(1000, 2000):
        rows.append((i, [float(x) for x in b_center + 0.15 * rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = train_ivf_centroids(df, n_centroids=8, sample_size=1000)

    def cos(u, v):
        u, v = np.asarray(u), np.asarray(v)
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    # at least one centroid deep inside EACH cluster (the id-prefix sample
    # gives max cosine to b_center ≈ cos(a, b) ≈ 0 here)
    assert max(cos(c, a_center) for c in cents) > 0.9
    assert max(cos(c, b_center) for c in cents) > 0.9

    qvec = [float(x) for x in b_center]
    truth = {r.vec_id for r in brute_force_topk(df, qvec, k=10).collect()}
    approx = {r.vec_id for r in
              ivf_ann_topk(df, qvec, k=10, n_centroids=8, n_probe=4).collect()}
    assert len(approx & truth) / len(truth) >= 0.9


@pytest.mark.heavy
def test_ivf_centroids_deterministic_and_balanced(planted_embeddings):
    """Training is RNG-free: two runs give identical centroids; centroids
    are unit-norm and non-degenerate (more than one distinct cell used)."""
    import math

    from llm_knowledge_graph_spark.operators.similarity import (
        ivf_assign, train_ivf_centroids)
    df, _ = planted_embeddings
    c1 = train_ivf_centroids(df, n_centroids=16)
    c2 = train_ivf_centroids(df, n_centroids=16)
    assert c1 == c2
    for c in c1:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
    cells = {r.cell for r in
             ivf_assign(df, c1).select("cell").distinct().collect()}
    assert len(cells) >= 8  # spread across cells, not collapsed


@pytest.mark.heavy
def test_multimodal_resize_and_frame_sample(spark):
    """Resize + frame-sample plumbing: typed schemas, kind filtering,
    deterministic fake payloads, 1→N frame fan-out matching duration."""
    from llm_knowledge_graph_spark.operators.multimodal import (
        resize_images, sample_frames, synthesize_media)
    media = synthesize_media(spark, n=30)

    resized = resize_images(media, width=16, height=8).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(resized) == n_images
    assert all(r["width"] == 16 and r["height"] == 8 for r in resized)
    assert all(len(r["payload"]) == 16 * 8 for r in resized)
    # determinism
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, width=16, height=8).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in resized} == again

    frames = sample_frames(media, every_ms=5000).collect()
    durs = {r["media_id"]: r["duration_ms"]
            for r in media.filter("kind = 'video'").collect()}
    by_media: dict = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    assert set(by_media) == set(durs)
    for mid, fs in by_media.items():
        expect = max(1, (int(durs[mid] or 0) + 4999) // 5000)
        assert len(fs) == expect
        assert sorted(f["frame_idx"] for f in fs) == list(range(expect))
        assert all(f["ts_ms"] == f["frame_idx"] * 5000 for f in fs)


def test_multimodal_video_decode_still_stubbed(spark):
    """sample_frames is the one remaining stub (ffmpeg-only territory) —
    fake=False must raise eagerly."""
    import pytest as _pytest

    from llm_knowledge_graph_spark.operators.multimodal import (
        sample_frames, synthesize_media)
    with _pytest.raises(NotImplementedError):
        sample_frames(synthesize_media(spark, n=3), fake=False)


def test_minhash_collapse_exact_avoids_pair_blowup(spark):
    """100 identical docs + one near-dup: all-pairs would be 4950 intra-
    group pairs; the collapse path emits 99 linear (rep, dup) pairs plus
    the rep-level near-dup — same connected components, no D² blowup."""
    from llm_knowledge_graph_spark.operators.dedup import minhash_lsh_near_dups
    rows = [(i, "the quick brown fox jumps over the lazy dog")
            for i in range(100)]
    rows.append((100, "the quick brown fox jumps over the lazy cat"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b): r.jaccard for r in
             minhash_lsh_near_dups(docs, "doc_id", "text", shingle_words=2,
                                   jaccard_threshold=0.5).collect()}
    dup_pairs = {(a, b) for (a, b), j in pairs.items() if j == 1.0}
    assert dup_pairs == {(0, i) for i in range(1, 100)}  # linear, rep = min
    assert (0, 100) in pairs and pairs[(0, 100)] < 1.0   # rep-level near-dup
    assert len(pairs) == 100                              # 99 + 1, not 4951


@pytest.mark.heavy
def test_ivf_persisted_index_prunes_partitions(spark, tmp_path, planted_embeddings):
    """Round 3: the MATERIALIZED IVF index (cell-partitioned parquet).
    Query answers must equal the inline ivf_ann_topk (same deterministic
    centroids), the on-disk layout must be one directory per cell, and the
    probe scan must show the cell predicate as a PartitionFilter (i.e. the
    read prunes to n_probe/n_centroids of the files)."""
    import contextlib
    import io
    import os

    from llm_knowledge_graph_spark.operators.similarity import (
        ivf_ann_topk, query_ivf_index, write_ivf_index)
    df, queries = planted_embeddings
    out = str(tmp_path / "ivf")
    write_ivf_index(df, out, n_centroids=16)
    cell_dirs = [d for d in os.listdir(f"{out}/vectors")
                 if d.startswith("cell=")]
    assert len(cell_dirs) >= 8

    for qvec in queries.values():
        inline = [(r.vec_id, r.score)
                  for r in ivf_ann_topk(df, qvec, k=10, n_centroids=16,
                                        n_probe=4).collect()]
        stored = [(r.vec_id, r.score)
                  for r in query_ivf_index(spark, out, qvec, k=10,
                                           n_probe=4).collect()]
        assert stored == inline

    # the cell predicate must reach the scan as a PARTITION filter
    from pyspark.sql import functions as F
    probe_scan = (spark.read.parquet(f"{out}/vectors")
                  .filter(F.col("cell").isin([0, 1])))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe_scan.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_paragraph_dedup_first_witness_and_reconstruction(spark):
    """Hand-computable corpus: shared paragraphs survive only at their
    global (doc_id, pos) first witness; reconstruction preserves
    within-doc order of kept paragraphs."""
    import hashlib
    from llm_knowledge_graph_spark.operators.dedup import paragraph_dedup
    rows = [
        (1, "alpha. shared one. beta"),
        (2, "shared one. gamma. shared two"),
        (3, "shared two. shared one. delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.n_paras, r.n_kept, r.kept_md5)
           for r in paragraph_dedup(df, "doc_id", "text").collect()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 1 keeps everything (it is the first witness of 'shared one')
    assert got[1] == (3, 3, h("alpha. shared one. beta"))
    # doc 2 loses 'shared one' (doc 1 owns it), keeps gamma + first
    # 'shared two'
    assert got[2] == (3, 2, h("gamma. shared two"))
    # doc 3 loses both shared paragraphs
    assert got[3] == (3, 1, h("delta"))


def test_snapshot_diff_statuses(spark):
    """All four statuses, including the null-text edge: a url whose
    body is null in BOTH snapshots is 'same' (presence, not digest
    nullness, decides new/gone)."""
    from llm_knowledge_graph_spark.operators.snapshots import \
        snapshot_diff
    old = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z"), ("n", None)],
        "url string, text string")
    new = spark.createDataFrame(
        [("a", "x"), ("b", "y2"), ("d", "w"), ("n", None)],
        "url string, text string")
    got = {r.url: r.status
           for r in snapshot_diff(old, new, "url").collect()}
    assert got == {"a": "same", "b": "changed", "c": "gone",
                   "d": "new", "n": "same"}


def test_containment_pairs_finds_embedded_doc(spark, tmp_path):
    """doc_containment_pairs: a small doc verbatim-embedded (as a prefix,
    so gram strides align) in a big doc yields a high-permille
    (doc_a=big, doc_b=small) row; the reverse direction and unrelated
    docs stay below the 500-permille floor. MinHash resemblance for this
    planted pair is ~0.3 — exactly the case containment exists for."""
    from llm_knowledge_graph_spark.plans.driver_queries import (
        q_doc_containment_pairs)
    base = " ".join(f"token{i:03d} alpha beta" for i in range(24))  # ~430ch
    rows = [
        (0, base),
        (1, base[:120]),                                   # prefix ⊂ doc 0
        (2, " ".join(f"other{i:03d} gamma" for i in range(24))),
    ]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.mode("overwrite").parquet(str(tmp_path / "documents.parquet")))
    out = {(r.doc_a, r.doc_b): r.containment_permille
           for r in q_doc_containment_pairs(spark, str(tmp_path)).collect()}
    assert (0, 1) in out and out[(0, 1)] >= 900
    assert (1, 0) not in out                    # big ⊄ small
    assert not any(2 in p for p in out)         # unrelated never paired
