"""Entity linking: MinHash-LSH blocking + similarity scoring (north rule).

The reference merges entities only on exact (label, id) and delegates
coreference to the LLM prompt (ref code/prompts.py:21-24); the north rule
upgrades this to real entity linking:

  1. shingle each entity name (lowercased char n-grams) — JVM-side exprs;
  2. MinHash signatures (numpy, one vectorized pandas UDF per batch);
  3. LSH banding: explode signatures into (band_id, band_hash) buckets and
     self-join on the bucket — candidate generation without the O(n²)
     cross-join (pairs only form inside a bucket);
  4. exact trigram-Jaccard scoring on candidates via array_intersect /
     array_union (JVM-side, no Python), threshold → similarity edges;
  5. optional alias-dictionary path: a small curated (alias → canonical)
     table broadcast to every executor, joined on lowercased name, with
     cosine scoring of deterministic name embeddings.

Scale: the self-join shuffles on (band_id, band_hash) — uniformly hashed,
so no skew; candidate count is bounded by bucket sizes. Same-type gating
keeps Person/Organization from cross-linking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# MinHash modulus. MUST be small enough that (a*x + b) actually WRAPS:
# with p = 2^61-1 and a < 2^31, x < 2^32, the product never reached p, so
# h_i(x) = a_i*x + b_i was monotone in x for EVERY i — all permutations
# selected the same min-shingle and the 128-perm signature degenerated to
# a single-permutation MinHash (no banding amplification; measured
# signature agreement 0.07 on Jaccard-0.82 sets). With p = 2^31-1 and
# x reduced mod p first, a*x < 2^62 stays exact in int64 AND wraps, giving
# independent permutations (agreement ≈ Jaccard, pinned by the property
# suite).
_MERSENNE = (1 << 31) - 1

# honorifics / generational suffixes carry no identity signal and create
# false bridges between distinct people ("Doctor Fatima Kim" ~ "Doctor
# Fatima Baker"); strip them before similarity scoring
_NAME_STOPWORDS = r"\b(doctor|dr|mr|mrs|ms|miss|prof|professor|jr|sr|ii|iii)\b\.?"


def normalized_name(col) -> "F.Column":
    """Lowercase, strip honorific/suffix tokens, collapse whitespace —
    all JVM-side expressions."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, _NAME_STOPWORDS, " ")
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    # a name that was ALL stopwords falls back to its raw lowered form
    return F.when(collapsed == "", lowered).otherwise(collapsed)


def with_shingles(names: DataFrame, col: str = "id", n: int = 3) -> DataFrame:
    """Adds `shingles`: distinct char n-grams of the *normalized* name.

    Pure Spark exprs: sequence + transform + substr — stays inside
    whole-stage codegen.
    """
    with_norm = names.withColumn("_norm", normalized_name(F.col(col)))
    lowered = F.col("_norm")
    k = F.greatest(F.length(lowered) - F.lit(n - 1), F.lit(1))
    return with_norm.withColumn(
        "shingles",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: lowered.substr(i, F.lit(n)),
            )
        ),
    ).drop("_norm")


def _perm_family(num_perm: int, seed: int):
    """The seeded (a, b) permutation family — ONE construction shared by
    the plain function and the Spark UDF, so the property suite validates
    the exact arithmetic production runs."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)[:, None]
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)[:, None]
    return a, b


def _signature(shingles, a, b, num_perm: int) -> list:
    """MinHash signature kernel: blake2b-32bit shingle hash reduced mod p,
    then (a·x + b) mod p per permutation, min over shingles."""
    import hashlib
    if shingles is None or len(shingles) == 0:
        return [0] * num_perm
    xs = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                        digest_size=4).digest(), "big")
         for s in shingles), dtype=np.int64, count=len(shingles))[None, :]
    return ((a * (xs % _MERSENNE) + b) % _MERSENNE).min(axis=1).tolist()


def minhash_signature(shingles, num_perm: int = 64, seed: int = 7) -> list:
    """Plain-Python MinHash signature — same kernel the vectorized UDF
    applies per row (used by the property-based suite and anywhere a
    driver-side signature is needed)."""
    a, b = _perm_family(num_perm, seed)
    return _signature(shingles, a, b, num_perm)


def make_minhash_udf(num_perm: int, seed: int = 7):
    """Vectorized MinHash over shingle arrays: h_i(x) = (a_i*x + b_i) mod p,
    p = 2^31-1 (see _MERSENNE: the modulus must be small enough to WRAP).

    Stays entirely in int64 SIMD arithmetic: the shingle hash is 32-bit
    (blake2b digest truncated — deterministic across workers, unlike
    salted `hash()`), reduced mod p, and a_i < p, so a_i*x + b_i < 2^62 —
    the modular hash is EXACT in int64, no object-dtype bignum fallback
    (an earlier object-dtype version spent ~10x the time in pure-Python
    int ops). 32-bit shingle space is ample: per-document shingle sets are
    ≪ 2^16, so cross-shingle collisions are ~2^-32 per pair."""
    a, b = _perm_family(num_perm, seed)

    @pandas_udf("array<long>")
    def minhash_udf(shingles: pd.Series) -> pd.Series:
        return shingles.map(lambda arr: _signature(arr, a, b, num_perm))

    return minhash_udf


def candidate_pairs(entities: DataFrame, num_perm: int = 64, bands: int = 16,
                    shingle_n: int = 3, id_col: str = "id",
                    type_col: str = "type") -> DataFrame:
    """entities(id, type) → candidate pairs (a, b, type, shingles_a/b), a < b.

    LSH: signature split into `bands` bands of num_perm/bands rows; two names
    collide if ANY band hashes equal. The pair space never materializes —
    only per-bucket joins.
    """
    rows = num_perm // bands
    minhash_udf = make_minhash_udf(num_perm)
    sigs = (
        with_shingles(entities.select(id_col, type_col).distinct(),
                      id_col, shingle_n)
        .withColumn("sig", minhash_udf(F.col("shingles")))
        .withColumn(
            "band",
            F.explode(F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band_id"),
                    F.hash(F.slice(F.col("sig"), i * rows + 1, rows)).alias("h"),
                ),
            )),
        )
        .select(F.col(id_col).alias("name"), F.col(type_col).alias("type"),
                "shingles", F.col("band.band_id").alias("band_id"),
                F.col("band.h").alias("band_hash"))
    )
    # materialize once: the self-join references sigs on BOTH sides — without
    # this the distinct+minhash+banding chain (incl. a python stage) runs twice
    sigs = sigs.localCheckpoint()
    left = sigs.select("band_id", "band_hash", "type",
                       F.col("name").alias("a"),
                       F.col("shingles").alias("shingles_a"))
    right = sigs.select("band_id", "band_hash", "type",
                        F.col("name").alias("b"),
                        F.col("shingles").alias("shingles_b"))
    return (
        left.join(right, ["band_id", "band_hash", "type"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "type", "shingles_a", "shingles_b")
        .dropDuplicates(["a", "b", "type"])
    )


def similarity_edges(entities: DataFrame, num_perm: int = 64, bands: int = 16,
                     shingle_n: int = 3, threshold: float = 0.8,
                     link_types=("Person", "Organization", "Place")) -> DataFrame:
    """→ (a, b, type, jaccard) pairs above threshold; exact trigram Jaccard
    computed JVM-side on LSH candidates only."""
    cand = candidate_pairs(
        entities.filter(F.col("type").isin(list(link_types))),
        num_perm, bands, shingle_n,
    )
    inter = F.size(F.array_intersect("shingles_a", "shingles_b"))
    union = F.size(F.array_union("shingles_a", "shingles_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "type", "jaccard")
    )


def alias_dictionary_links(entities: DataFrame, alias_dict: DataFrame,
                           cosine_threshold: float = 0.0) -> DataFrame:
    """Optional curated-alias path (north rule: alias dictionary broadcast
    as an Arrow table + cosine-similarity scoring):
    alias_dict(alias, canonical_id[, embedding]) is tiny → broadcast hash
    join on lower(name); emits (a=name, b=canonical_id) link edges.

    Cosine gating: when the dictionary carries an `embedding` column
    (the canonical name's vector), the matched entity name is embedded by
    the same deterministic encoder (reference_impl.embed_text — the
    fixture stand-in for a real sentence encoder, batched through one
    pandas/Arrow UDF) and the link is kept only if
    cosine(name_vec, canonical_vec) >= cosine_threshold; the score rides
    in the `jaccard` column. Without embeddings the score is 1.0
    (join-match is the evidence)."""
    has_emb = "embedding" in alias_dict.columns
    links = (
        entities.join(
            F.broadcast(alias_dict),
            F.lower(entities["id"]) == F.lower(alias_dict["alias"]),
        )
        .filter(F.col("id") != F.col("canonical_id"))
    )
    if not has_emb:
        return links.select(
            F.col("id").alias("a"), F.col("canonical_id").alias("b"),
            F.col("type").alias("type")).withColumn("jaccard", F.lit(1.0))

    from ..functions.vectors import cosine as cos_expr
    from ..reference_impl import embed_text

    @pandas_udf("array<float>")
    def embed_udf(names: pd.Series) -> pd.Series:
        return names.map(lambda s: embed_text(s.lower()))

    return (
        links.withColumn("_name_vec", embed_udf(F.col("id")))
        .withColumn("score", cos_expr(F.col("_name_vec"), F.col("embedding")))
        .filter(F.col("score") >= F.lit(cosine_threshold))
        .select(F.col("id").alias("a"), F.col("canonical_id").alias("b"),
                F.col("type").alias("type"),
                F.round(F.col("score"), 6).alias("jaccard"))
    )
