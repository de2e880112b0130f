"""Engine-portable probabilistic sketches for web-scale corpus statistics.

Three classic crawl-pipeline sketches, each defined over md5 so the SAME
bit-exact computation runs on Spark (JVM codegen) and any ANSI engine
(the DuckDB oracles replay them verbatim — a *value-hash* check on a
probabilistic data structure, possible only because the sketch contract
is pinned to integer arithmetic over md5 hex):

* **HyperLogLog** (``hll_distinct``) — per-key distinct-count estimate.
  Registers are a ``groupBy(key, bucket).max(rho)`` — map-side
  combinable, mergeable across partitions/days by construction, and the
  register table is ``m`` rows per key REGARDLESS of corpus size. At
  100 TB this replaces a full ``COUNT(DISTINCT)`` shuffle of every
  token occurrence with a bounded-state aggregate.
* **Count-min sketch** (``cms_counters`` / ``cms_estimate``) — heavy-
  hitter frequency estimation. The counter table is a FIXED ``d×w``
  grid (here 4×4096 = 16,384 rows) whatever the corpus; merge across
  shards = elementwise sum. Estimates are upper bounds (min over rows),
  never undercounts.
* **Bloom-filter broadcast anti-join** (``bloom_bitmap`` /
  ``bloom_membership_col``) — blocklist filtering without shuffling the
  corpus. The bitmap is bounded by design (m bits, default 64 Ki = one
  8 KiB broadcast literal), built once from the blocklist side and
  applied to the probe side as a pure JVM bit test — the 100 TB probe
  never shuffles, never joins; only bloom-POSITIVES proceed to the
  exact (broadcast) verification join.

Integer-exactness rules (shared with the temperature/BPE queries):
every intermediate that could exceed int64 rides DECIMAL(38,0) on
Spark / HUGEINT on DuckDB, and every division is integer floor
division (Spark ``div`` ≡ DuckDB ``//`` — parity pinned by
``tests/test_sketches.py``).

Reference anchor: the reference pipeline counts entities/triples
exactly in driver memory (code/pdf_graphrag.py:648-649 report totals);
these operators are the at-scale replacements a 10^12-document corpus
needs (SURVEY.md §2.8 "Aggregations" → sketched variants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — the fixed-point unit for HLL register terms: term(rho) =
# 2^(60-rho) is exact int64 for rho in [1, 60] and order-invariant to sum.
_UNIT = 1 << 60

# alpha_256 = 0.7213 / (1 + 1.079/256) pinned to ppm so both engines use
# the identical constant (no float literal crosses an engine boundary).
HLL_ALPHA_PPM = 718273


# ---------------------------------------------------------------------------
# shared md5-hex → integer machinery (Spark Column + SQL-text twins)
# ---------------------------------------------------------------------------

def hex_int_col(col: Column, start: int, length: int) -> Column:
    """Big-endian integer value of ``length`` lowercase-hex chars of
    ``col`` starting at 1-based ``start``. Pure codegen (ascii/substring/
    CASE); identical semantics to :func:`hex_int_sql`."""
    out = F.lit(0).cast("bigint")
    for i in range(length):
        c = F.substring(col, start + i, 1)
        nib = F.ascii(c) - F.when(c.between("0", "9"), F.lit(48)) \
                            .otherwise(F.lit(87))
        out = out * 16 + nib
    return out


def hex_int_sql(expr: str, start: int, length: int) -> str:
    """ANSI-SQL twin of :func:`hex_int_col` (DuckDB oracle side)."""
    out = "0"
    for i in range(length):
        c = f"substr({expr}, {start + i}, 1)"
        nib = (f"(ascii({c}) - CASE WHEN {c} BETWEEN '0' AND '9' "
               f"THEN 48 ELSE 87 END)")
        out = f"(({out}) * 16 + {nib})"
    return out


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _hll_rho_col(tail: Column, tail_hex_len: int) -> Column:
    """Position of the first 1-bit (1-based) in the big-endian bit string
    of a lowercase-hex ``tail``; all-zeros → 4*len + 1 (sentinel: the
    register term is then 0 via the >60 guard)."""
    lz_hex = F.length(F.regexp_extract(tail, "^0*", 0))
    first = F.substr(tail, lz_hex + 1, F.lit(1))
    extra = (F.when(first == "1", 3)
             .when(first.isin("2", "3"), 2)
             .when(first.isin("4", "5", "6", "7"), 1)
             .otherwise(0))
    rho = lz_hex * 4 + extra + 1
    return F.when(lz_hex == tail_hex_len, 4 * tail_hex_len + 1) \
            .otherwise(rho)


def _hll_rho_sql(tail: str, tail_hex_len: int) -> str:
    lz = f"length(regexp_extract({tail}, '^0*'))"
    first = f"substr({tail}, {lz} + 1, 1)"
    extra = (f"CASE WHEN {first} = '1' THEN 3 "
             f"WHEN {first} IN ('2','3') THEN 2 "
             f"WHEN {first} IN ('4','5','6','7') THEN 1 ELSE 0 END")
    return (f"CASE WHEN {lz} = {tail_hex_len} THEN {4 * tail_hex_len + 1} "
            f"ELSE {lz} * 4 + {extra} + 1 END")


def hll_registers(df: DataFrame, key_col: str, item_col: str) -> DataFrame:
    """Per-``key_col`` HyperLogLog register table ``(key, bucket, r)``
    with m=256 registers (hash = md5; bucket = first 2 hex chars; rho =
    first 1-bit of the next 60 bits). ≤ m rows per key at ANY input
    size; registers from disjoint shards / micro-batches merge by
    ``groupBy(key, bucket).max(r)`` — the accumulator shape for
    incremental and streaming distinct counting (mergeability is
    test-asserted in tests/test_sketches.py)."""
    h = F.md5(F.col(item_col).cast("string"))
    return (df.filter(F.col(item_col).isNotNull())
              .select(key_col,
                      hex_int_col(h, 1, 2).alias("bucket"),
                      _hll_rho_col(F.substring(h, 3, 15), 15).alias("rho"))
              .groupBy(key_col, "bucket")
              .agg(F.max("rho").alias("r")))


def hll_estimate(registers: DataFrame, key_col: str) -> DataFrame:
    """Finish a register table into ``(key_col, n_hll:bigint)`` with the
    raw-HLL estimator alpha·m²/Σ2^(-rho_j) (no small/large-range
    correction — the PINNED engine contract the oracle replays
    bit-for-bit; accuracy σ ≈ 1.04/√m ≈ 6.5 % is asserted in tests).
    Empty registers contribute 2^0 = 1 in 2^-rho units (2^60 in the
    fixed-point units)."""
    # SQL shiftleft accepts a column shift amount (the pyspark wrapper
    # F.shiftleft does not) — call_function routes to the SQL builtin
    term = (F.when(F.col("r") > 60, F.lit(0))
            .otherwise(F.call_function(
                "shiftleft", F.lit(1).cast("bigint"),
                (F.lit(60) - F.col("r")).cast("int"))))
    num = HLL_ALPHA_PPM * 256 * 256 * _UNIT  # exact Python int constant
    # cast each term to decimal BEFORE summing: 256 registers × 2^59 max
    # term exceeds int64 (ANSI mode would overflow mid-aggregate)
    agg = (registers.groupBy(key_col)
           .agg(F.sum(term.cast("decimal(38,0)")).alias("s_hit"),
                F.count("*").alias("n_hit")))
    s_total = (F.col("s_hit")
               + (F.lit(256) - F.col("n_hit")).cast("decimal(38,0)")
               * F.lit(_UNIT).cast("decimal(38,0)"))
    # integer floor division — Spark `div` ≡ DuckDB `//` (parity-tested)
    agg = agg.withColumn("s6", (s_total * F.lit(1000000).cast("decimal(38,0)"))
                         .cast("decimal(38,0)"))
    return agg.selectExpr(
        key_col,
        f"CAST(CAST({num} AS DECIMAL(38,0)) div s6 AS BIGINT) AS n_hll")


def hll_distinct(df: DataFrame, key_col: str, item_col: str) -> DataFrame:
    """One-shot per-key HLL distinct estimate:
    ``hll_estimate(hll_registers(df))``. Returns (key_col, n_hll)."""
    return hll_estimate(hll_registers(df, key_col, item_col), key_col)


def hll_oracle_sql(items_cte: str, key: str, item: str) -> str:
    """DuckDB twin of :func:`hll_distinct`: ``items_cte`` must yield
    columns (``key``, ``item``); returns SQL producing (key, n_hll)."""
    num = HLL_ALPHA_PPM * 256 * 256 * _UNIT
    bucket = hex_int_sql("h", 1, 2)
    rho = _hll_rho_sql("substr(h, 3, 15)", 15)
    return f"""
    WITH items AS ({items_cte}),
    hashed AS (SELECT {key} AS k, md5(CAST({item} AS VARCHAR)) AS h
               FROM items WHERE {item} IS NOT NULL),
    regs AS (SELECT k, {bucket} AS bucket, MAX({rho}) AS r
             FROM hashed GROUP BY k, {bucket}),
    agg AS (SELECT k,
                   CAST(SUM(CASE WHEN r > 60 THEN 0
                            ELSE (CAST(1 AS BIGINT) << (60 - r)) END)
                        AS HUGEINT) AS s_hit,
                   COUNT(*) AS n_hit
            FROM regs GROUP BY k)
    SELECT k AS {key},
           CAST(CAST({num} AS HUGEINT)
                // ((s_hit + (256 - n_hit) * CAST({_UNIT} AS HUGEINT))
                    * 1000000) AS BIGINT) AS n_hll
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

CMS_D = 4       # hash rows
CMS_W = 4096    # buckets per row (3 hex chars)


def cms_counters(counts: DataFrame, item_col: str,
                 weight_col: str) -> DataFrame:
    """Build the d×w count-min counter grid from an (item, weight) table.
    Returns ``(j:int, bucket:bigint, c:bigint)`` — at most d·w = 16,384
    rows regardless of input size (map-side combinable sum; grids from
    disjoint shards merge by +)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("j")
    ex = counts.select(item_col, weight_col, j)
    h = F.md5(F.concat_ws(":", F.col("j"), F.col(item_col)).cast("string"))
    return (ex.withColumn("bucket", hex_int_col(h, 1, 3))
              .groupBy("j", "bucket")
              .agg(F.sum(weight_col).alias("c")))


def cms_estimate(items: DataFrame, counters: DataFrame,
                 item_col: str) -> DataFrame:
    """Point-estimate each item's weight from the counter grid:
    min over the d rows of the counter the item hashes into. The
    counter grid is tiny (≤16,384 rows) — broadcast it; the item side
    never shuffles. Adds column ``cms_est`` (an upper bound: every
    counter the item touches holds its true weight plus collisions)."""
    j = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("j")
    ex = items.select(item_col, j)
    h = F.md5(F.concat_ws(":", F.col("j"), F.col(item_col)).cast("string"))
    ex = ex.withColumn("bucket", hex_int_col(h, 1, 3))
    # LEFT join: a (j, bucket) cell no inserted item hashed to is absent
    # from the sparse grid and means count 0 — an inner join would drop
    # it, inflating unseen items to min-over-colliding-cells (or losing
    # them from the output when all d cells are empty).
    joined = (ex.join(F.broadcast(counters), ["j", "bucket"], "left")
                .withColumn("c", F.coalesce("c", F.lit(0).cast("bigint"))))
    return (joined.groupBy(item_col)
            .agg(F.min("c").alias("cms_est")))


def cms_bucket_sql(j_expr: str, item_expr: str) -> str:
    """DuckDB twin of the CMS bucket assignment."""
    h = f"md5(CAST({j_expr} AS VARCHAR) || ':' || CAST({item_expr} AS VARCHAR))"
    return hex_int_sql(h, 1, 3)


# ---------------------------------------------------------------------------
# Bloom filter (broadcast-bitmap blocklist membership)
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_M = 65536          # bits  (8 KiB bitmap → 1,024 int64 words)
_BLOOM_WORDS = BLOOM_M // 64


def bloom_bucket_col(key: Column, i: int) -> Column:
    """i-th bloom hash of a string key → bucket in [0, BLOOM_M)."""
    return hex_int_col(F.md5(F.concat_ws(":", F.lit(i), key).cast("string")),
                       1, 4)


def bloom_bucket_sql(i_expr: str, key_expr: str) -> str:
    h = f"md5(CAST({i_expr} AS VARCHAR) || ':' || {key_expr})"
    return hex_int_sql(h, 1, 4)


def bloom_bitmap(keys: DataFrame, key_col: str) -> list:
    """Aggregate the blocklist side into a BLOOM_M-bit bitmap (a Python
    list of 1,024 int64 words, ready for ``F.lit``).

    The ``collect`` here is bounded BY CONSTRUCTION: the distinct-bucket
    set is ≤ min(BLOOM_K·|blocklist|, BLOOM_M) = ≤65,536 ints whatever
    the blocklist size — the same bounded-driver-state class as the
    union-find limit probe (components.py). At 100 TB the bitmap is
    still 8 KiB; it broadcasts as a plan literal and the probe side is
    a pure codegen bit test (no shuffle, no join)."""
    bucket_union = None
    k = F.col(key_col)
    for i in range(BLOOM_K):
        b = keys.filter(k.isNotNull()).select(
            bloom_bucket_col(k, i).alias("bucket"))
        bucket_union = b if bucket_union is None else bucket_union.union(b)
    buckets = [r.bucket for r in bucket_union.distinct().collect()]
    words = [0] * _BLOOM_WORDS
    for b in buckets:
        words[b // 64] |= 1 << (b % 64)
    # int64 two's-complement for the JVM literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_membership_col(key: Column, words: list) -> Column:
    """True iff all BLOOM_K bloom bits for ``key`` are set in ``words``
    (the bitmap from :func:`bloom_bitmap`). Pure JVM expression: an
    8 KiB array literal + shift/mask per hash — this is the anti-join
    that never shuffles."""
    arr = F.lit(words)
    cond = F.lit(True)
    for i in range(BLOOM_K):
        b = bloom_bucket_col(key, i)
        # pure-integer addressing: b>>6 = word index, b&63 = bit index;
        # arithmetic >> plus &1 reads the bit correctly even when the
        # word literal is negative (two's-complement high bit set)
        word = F.element_at(arr, F.call_function(
            "shiftright", b, F.lit(6)).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word,
            b.bitwiseAND(F.lit(63)).cast("int")).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles (the mergeable-quantile sketch)
# ---------------------------------------------------------------------------
# The fourth classic sketch family (with HLL / CMS / Bloom above): a
# bounded-error quantile structure whose shards merge by plain addition.
# A fixed bin width w buckets an integer value column into value div w;
# the per-(key, bin) counts are the ENTIRE sketch state — mergeable by
# SUM across shards/days/partitions (the same algebraic-merge law as the
# CMS grid), and any permille q is answered from the cumulative counts
# with a guaranteed bracket: the true q-quantile lies in
# [lo, lo + w) for the reported bin floor lo. Everything is integer
# arithmetic (div / ceil-free cross-multiplication), so Spark, DuckDB,
# and a plain-Python twin agree bit-for-bit — unlike t-digest/KLL, whose
# float centroids are engine-specific. At 100 TB: the map side combines
# to ≤ n_keys · n_bins rows regardless of input size, one narrow shuffle.


def hist_bins(df: DataFrame, key_col: str, value_col: str,
              bin_width: int) -> DataFrame:
    """Sketch phase: per-(key, bin) counts with bin = value div width.
    Returns ``(key_col, bin:long, c:bigint)`` — shards merge by summing
    ``c`` on (key, bin).

    Values must be NON-NEGATIVE integers: ``div`` truncates toward zero
    (Spark and DuckDB alike), so a negative value would share bin 0 with
    [0, w) and break the bracket guarantee. Callers sketch counts/
    lengths/sizes, all >= 0 by construction; shift-then-sketch if a
    signed domain ever needs this."""
    return (df.filter(F.col(value_col).isNotNull())
            .groupBy(key_col,
                     F.expr(f"{value_col} div {bin_width}").alias("bin"))
            .agg(F.count("*").alias("c")))


def hist_quantiles(bins: DataFrame, key_col: str, permilles: list,
                   bin_width: int) -> DataFrame:
    """Answer phase: for each key and permille p, the SMALLEST bin whose
    cumulative count reaches p/1000 of the key's total (computed as
    1000·cum ≥ p·total — pure integer, no rounding mode to pin).
    Returns ``(key_col, permille:int, lo:long)`` with the guarantee
    true_quantile ∈ [lo, lo + bin_width)."""
    w = Window.partitionBy(key_col).orderBy("bin")
    cum = bins.select(
        key_col, "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(key_col)).alias("total"))
    p = F.explode(F.array(*[F.lit(int(x)) for x in permilles]))
    return (cum.select(key_col, "bin", "cum", "total",
                       p.alias("permille"))
            .filter(F.col("cum") * 1000 >= F.col("permille")
                    * F.col("total"))
            .groupBy(key_col, "permille")
            .agg(F.min("bin").alias("bin"))
            .select(key_col, F.col("permille").cast("int").alias("permille"),
                    (F.col("bin") * bin_width).cast("long").alias("lo")))
