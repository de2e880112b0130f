"""Driver-facing query catalog: every entry is an operator from SURVEY §2
(or a training-data-pipeline op from the build brief) expressed Spark-first,
with a DuckDB oracle in ORACLE_SQL where ANSI SQL can express it.

Cross-engine determinism rules (the driver hash-compares values):
  * money/double sums go through integer cents
    (`cast(round(x*100) as bigint)`) — exact in both engines;
  * derived averages divide exact integers → identical IEEE doubles;
  * ranked outputs carry explicit deterministic tie-breaks;
  * cosine scores are ordered on the raw double but only ranks are output.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import safe_seq
from ..functions.vectors import cosine
from ..operators import dedup, similarity


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Relational surface (SURVEY §2.8: filter/join/agg/window/topk/setop/json)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style scan+agg (V1-V3-style ratio aggregates live here too)."""
    li = _t(spark, sf_dir, "lineitem")
    g = (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_price_cents"),
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
         .alias("sum_disc_price_cents"),
        F.count("*").alias("count_order"),
    ))
    return (g.withColumn(
        "avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 4))
        .withColumn("avg_price_cents",
                    F.round(F.col("sum_base_price_cents") / F.col("count_order"), 4))
        .orderBy("l_returnflag", "l_linestatus"))


def q_top_customers(spark, sf_dir):
    """Equi-join + agg + deterministic top-k."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"),
                 F.count("*").alias("n_orders"))
            .orderBy(F.desc("spend_cents"), "c_custkey")
            .limit(10))


def q_region_revenue(spark, sf_dir):
    """5-way star join; dims broadcast (verified in EXPLAIN.md)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.sum(rev).alias("revenue_cents"),
                 F.count("*").alias("n_lineitems"))
            .orderBy("r_name"))


def q_order_priority_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.filter(F.col("o_orderstatus") != "F")
            .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
            .orderBy("o_orderpriority"))


def q_market_segment_stats(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"))
        .withColumn("avg_acctbal",
                    F.round(F.col("acctbal_cents") / 100.0
                            / F.col("n_customers"), 4))
        .orderBy("c_mktsegment"))


def q_events_latest_per_user(spark, sf_dir):
    """Window dedup — V5 'prefer latest' analogue (row_number per key)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_id", "event_type")
            .orderBy("user_id"))


def q_events_type_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(_cents(F.col("value"))).alias("value_cents"))
        .withColumn("avg_value",
                    F.round(F.col("value_cents") / 100.0 / F.col("n"), 4))
        .orderBy("event_type"))


def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (the batch twin of session windows): a new
    session starts when >30 min passed since the user's previous event —
    lag + running sum of session-start flags, then per-user session stats.
    Full-precision double epoch seconds on both engines → identical gaps."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full-precision epoch seconds (micros/1e6 as double) on BOTH engines —
    # casting to long would truncate micros while DuckDB epoch() keeps them
    sec = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag(sec).over(w)
    # split at gap >= 1800s — ALIGNED with session_window's end-exclusive
    # windows (an event exactly gap after the last starts a new session),
    # so all three sessionization implementations share one semantics
    new_sess = F.when(prev.isNull() | ((sec - prev) >= 1800.0), 1) \
        .otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_event = e.select("user_id", "event_id",
                         new_sess.alias("is_new"), sess_id.alias("sess"))
    return (per_event.groupBy("user_id")
            .agg(F.max("sess").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))


def q_user_session_windows(spark, sf_dir):
    """The SAME sessionization computed with Spark's NATIVE session_window
    (merging event-time windows with a 30-min gap) instead of the
    hand-rolled lag/running-sum of q_user_sessions — both verify against
    one DuckDB oracle, so the two independent implementations and the
    oracle must triple-agree (all three split at gap >= 30 min —
    session_window windows are end-exclusive and the lag variants were
    aligned to match)."""
    e = _t(spark, sf_dir, "events")
    sess = (e.groupBy(
        "user_id",
        F.session_window(F.col("ts").cast("timestamp"), "30 minutes"))
        .agg(F.count("*").alias("n")))
    return (sess.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n").alias("n_events"))
            .orderBy("user_id"))


def q_events_stream_sessions(spark, sf_dir):
    """STREAMING stateful session windows: the same 30-min-gap
    sessionization as q_user_sessions/q_user_session_windows, computed by
    Structured Streaming's session_window state machine (watermarked,
    drained with availableNow, complete mode) — the third independent
    implementation verifying against the single DuckDB oracle."""
    from ..streaming.windowed import session_counts_stream
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = session_counts_stream(stream, gap="30 minutes",
                                watermark="2 hours")
    q = (agg.writeStream.format("memory")
         .queryName("events_stream_sessions")
         .outputMode("complete").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("events_stream_sessions did not drain in 120s")
    return (spark.table("events_stream_sessions")
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n").alias("n_events"))
            .orderBy("user_id"))


def q_nations_without_suppliers(spark, sf_dir):
    """Anti-join: nations with no HIGH-BALANCE supplier (s_acctbal > 8000).
    The unfiltered predicate returns 0 rows at sf>=0.01 (every nation has
    some supplier), which verifies nothing — the selective predicate yields
    ~13 rows at sf0.01, so the anti-join is evidenced by real output."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 8000)
    return (n.join(s, n.n_nationkey == s.s_nationkey, "left_anti")
            .select("n_name").orderBy("n_name"))


def q_part_type_counts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (p.filter(F.col("p_size") > 25)
            .groupBy("p_type").agg(
                F.count("*").alias("n"),
                F.sum(_cents(F.col("p_retailprice"))).alias("retail_cents"))
            .orderBy("p_type"))


def q_orders_priority_rollup(spark, sf_dir):
    """ROLLUP aggregation (subtotals + grand total — the grouping-set
    surface Spark gives free; reference has no grouping sets at all).
    Null group markers coalesced to 'ALL' for deterministic cross-engine
    output."""
    o = _t(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
                    "n", "revenue_cents")
            .orderBy("status", "priority"))


def q_urgent_and_high_customers(spark, sf_dir):
    """Set operation (INTERSECT): customers who placed BOTH an urgent and
    a high-priority order."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return (urgent.intersect(high)
            .select(F.col("o_custkey").alias("custkey"))
            .orderBy("custkey"))


def q_events_json_extract(spark, sf_dir):
    """JSON scalar functions (SURVEY §2.8: from_json/get_json_object)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (e.select("event_id", k.alias("k"))
            .filter(F.col("k") > 90)
            .orderBy("event_id"))


# ---------------------------------------------------------------------------
# Document / text surface (training-data pipeline ops)
# ---------------------------------------------------------------------------

def q_doc_lang_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"))
        .orderBy("lang"))


def q_doc_token_stats(spark, sf_dir):
    """Token counting over single-space-joined text (exact arithmetic)."""
    d = _t(spark, sf_dir, "documents")
    # materialize the token array once — re-referencing a split() EXPRESSION
    # inside other expressions re-evaluates the split per use
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    return (d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round((F.col("n_chars") - (F.size("toks") - 1))
                / F.size("toks"), 4).alias("avg_token_len"))
        .orderBy(F.desc("n_tokens"), "doc_id")
        .limit(20))


def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup stats per language on a 32-char text-prefix key (the
    boilerplate-prefix dedup a crawl pipeline runs): the full-text key has
    zero duplicates at sf0.01 (1 trivial aggregate row), while the prefix
    key exposes ~24 dup docs across 5 language groups — non-trivial rows
    verifying the hash-groupBy dedup path."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "prefix", F.substring("text", 1, 32))
    return (dedup.exact_dedup_stats(d, "prefix", group_cols=["lang"])
            .orderBy("lang"))


def q_doc_stopword_ratio(spark, sf_dir):
    """Quality scoring: stopword-hit counts per doc (language-marker
    heuristic); exact integer output."""
    d = _t(spark, sf_dir, "documents")
    en = ["the", "a", "of", "and", "to", "is"]
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    hits = F.size(F.filter(F.col("toks"), lambda x: x.isin(en)))
    return (d.select("doc_id", "lang",
                     F.size("toks").alias("n_tokens"),
                     hits.alias("n_stopword_hits"))
            .filter(F.col("n_stopword_hits") > 0)
            .orderBy(F.desc("n_stopword_hits"), "doc_id")
            .limit(25))


def q_word_cooccurrence(spark, sf_dir):
    """Adjacent-word co-occurrence 'triples' over the bag-of-words corpus —
    the word-level stand-in for SVO extraction on this fixture."""
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")
    pairs = F.transform(
        safe_seq(F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("subj"),
                           F.element_at(toks, i + 1).alias("obj")),
    )
    return (d.filter(F.size(toks) >= 2)
            .select(F.explode(pairs).alias("p"))
            .select(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
            .groupBy("subj", "obj").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "subj", "obj")
            .limit(25))


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of 64-char prefix, per-lang uniqueness."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.substring(F.col("text"), 1, 64))
    return (d.select("lang", fp.alias("fp"))
            .groupBy("lang").agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("fp").alias("n_distinct_fp"))
            .orderBy("lang"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup (brute-force baseline, bounded input;
    exact integer division → engine-identical doubles). doc_id < 300 at
    threshold 0.12 emits ~10 pairs at sf0.01 (the round-1 settings emitted
    a single pair, verifying almost nothing)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return (dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.12)
            .orderBy("a", "b"))


def q_doc_lang_id(spark, sf_dir):
    """Language-ID heuristic (n-gram/stopword markers): per-language marker
    hits → argmax with first-in-order tie-break; confusion counts vs the
    labeled lang. Marker sets from functions/text.py LANG_MARKERS."""
    from ..functions.text import LANG_MARKERS
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.lower(F.col("text")), " "))
    langs = sorted(LANG_MARKERS)
    for lang in langs:
        markers = LANG_MARKERS[lang]
        d = d.withColumn(
            f"h_{lang}",
            F.size(F.filter(F.col("toks"), lambda x: x.isin(markers))))
    mx = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((mx > 0) & (F.col(f"h_{lang}") == mx),
                      F.lit(lang)).otherwise(pred)
    return (d.select("lang", pred.alias("predicted"))
            .groupBy("lang", "predicted").agg(F.count("*").alias("n"))
            .orderBy("lang", "predicted"))


def q_doc_quality(spark, sf_dir):
    """Quality scoring: length / word-length / punctuation heuristics with
    cross-engine-exact arithmetic (punct counted via translate; texts are
    single-space-joined so avg token length is integer arithmetic)."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    avg_wl = (F.col("n_chars") - (n_tok - 1)) / n_tok
    n_punct = F.length("text") - F.length(F.translate("text", ".,!?;:", ""))
    len_ok = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    wl_ok = F.when((avg_wl >= 3) & (avg_wl <= 10), F.lit(1.0)).otherwise(0.5)
    # greatest(n_chars, 1): an empty doc (n_chars = 0, n_punct = 0) must
    # score punct_ok = 1.0, not divide by zero under ANSI mode — same
    # guard in the oracle twin
    punct_ok = F.lit(1.0) - F.least(
        n_punct * 5.0 / F.greatest(F.col("n_chars"), F.lit(1)), F.lit(1.0))
    score = F.round((len_ok + wl_ok + punct_ok) / 3.0, 4)
    return (d.select("doc_id", n_tok.alias("n_tokens"),
                     score.alias("quality"))
            .orderBy(F.desc("quality"), "doc_id").limit(20))


def q_doc_regex_tokens(spark, sf_dir):
    """BPE-ish regex tokenization: word pieces / numbers / single
    punctuation via regexp_extract_all — compares sub-word token counts to
    whitespace counts."""
    d = _t(spark, sf_dir, "documents")
    pat = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
    rt = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), F.lit(0)))
    wt = F.size(F.split(F.col("text"), " "))
    return (d.select("doc_id", rt.alias("n_regex_tokens"),
                     wt.alias("n_ws_tokens"))
            .orderBy(F.desc("n_regex_tokens"), "doc_id")
            .limit(20))


def q_doc_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing-style): fingerprint =
    min md5 over sliding 16-char windows (stride 4). Near-identical texts
    share the minimizing window → equal fingerprints; distinct-fp counts
    per language expose the duplicate mass."""
    d = _t(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    k = F.greatest((F.length(t) - 15), F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), k, F.lit(4)),
        lambda i: F.md5(t.substr(i, F.lit(16))),
    )
    fp = F.array_min(windows)
    return (d.select("lang", fp.alias("fp"))
            .groupBy("lang").agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("fp").alias("n_distinct_fp"))
            .orderBy("lang"))


def q_events_hourly_stream_counts(spark, sf_dir):
    """Structured Streaming, VALUE-VERIFIED: watermarked 1-hour windowed
    counts over the events file stream, drained with availableNow — the
    drained complete-mode result must equal the batch date_trunc rollup,
    which IS ANSI-expressible, so this streaming path gets a DuckDB
    oracle (unlike rows-only kg_streaming_lang_counts)."""
    from ..streaming.windowed import windowed_event_counts
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory")
         .queryName("events_hourly_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("events_hourly_stream did not drain within 120s")
    return (spark.table("events_hourly_stream")
            .select("window_start", "event_type", "n", "value_cents")
            .orderBy("window_start", "event_type"))


def q_doc_classification(spark, sf_dir):
    """E11 text classification (ref stub code/pdf_graphrag.py:570-571,
    prompt/schema code/prompts.py:140-166): ordered keyword-rule chain
    compiled to one CASE expression + occurrence-count confidence —
    fully codegen, oracled value-exact."""
    from ..operators.classify import keyword_classify
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (keyword_classify(d)
            .select("doc_id", "lang", "doc_type", "confidence")
            .orderBy("doc_id"))


# statute-style Slovak synthesis for the taxonomy classifier (all-lowercase
# so unicode lower() is identity on both engines); each line carries one
# legislation-type keyword and one legal-area marker from the reference
# taxonomies (code/assets/TYP_PREDPISU.md, CLENENIE_PRAVA.md)
_TAXONOMY_TEXTS = [
    "zákon o dani z príjmov upravuje dane a správu daní.",
    "ústavný zákon o ústavnom súde slovenskej republiky.",
    "vyhláška ministerstva spravodlivosti o trestnom konaní.",
    "nariadenie vlády o bankách a dohľade nad bankami.",
    "zmluva o medzinárodnom obchode medzi zmluvnými stranami.",
]


def q_doc_taxonomy_classification(spark, sf_dir):
    """E11 against the reference's REAL taxonomies, ORACLED (round 3):
    deterministic statute-style synthesis per doc_id (identical CASE on
    both engines), classified by classify_reference_taxonomy into the
    reference's response shape {type_legislation, type_category} + 0-100
    confidences (ref code/prompts.py:140-166). The oracle's CASE chains
    are GENERATED from the same LEGISLATION_RULES / LEGAL_AREA_RULES
    lists (see _taxonomy_case_sql), so rule precedence and occurrence
    counting are verified value-exact, not re-hand-written."""
    from ..operators.classify import classify_reference_taxonomy
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    t = F.lit(_TAXONOMY_TEXTS[0])
    for i, s in enumerate(_TAXONOMY_TEXTS[1:], start=1):
        t = F.when(F.col("doc_id") % 5 == i, F.lit(s)).otherwise(t)
    d = d.select("doc_id", t.alias("text"))
    return (classify_reference_taxonomy(d)
            .select("doc_id", "type_legislation", "leg_confidence",
                    "type_category", "cat_confidence")
            .orderBy("doc_id"))


def q_orders_monthly_revenue(spark, sf_dir):
    """Date-function surface (year/month bucketing — SURVEY §2.8 date/math):
    monthly revenue in exact integer cents."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mo"))
            .agg(F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
                 F.count("*").alias("n_orders"))
            .orderBy("yr", "mo"))


def q_ship_delay_stats(spark, sf_dir):
    """datediff + join: order→ship delay bucketed by week; exact integer
    aggregates (sum of day counts, min/max) — no float drift."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select(delay.alias("delay_days"))
            .withColumn("delay_week", F.floor(F.col("delay_days") / 7))
            .groupBy("delay_week")
            .agg(F.count("*").alias("n"),
                 F.sum("delay_days").alias("sum_delay_days"),
                 F.min("delay_days").alias("min_delay"),
                 F.max("delay_days").alias("max_delay"))
            .orderBy("delay_week"))


# ---------------------------------------------------------------------------
# Legal NER surface (E8/E9 full pattern breadth, ref
# code/legal-llm/legal_graphrag.py:103-230). The driver's documents table is
# bag-of-words (no legal content), so each query first synthesizes legal
# text as a DETERMINISTIC function of doc_id — the identical expression runs
# in the DuckDB oracle, so the regex extraction itself is what is verified.
# All extractors are pure JVM regexp expressions (operators/legal_ner.py).
# ---------------------------------------------------------------------------

_PARTY_A = ["Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Co"]
_PARTY_B = ["Stark Industries", "Wayne Enterprises", "Hooli Inc"]


def _synth_legal_text() -> F.Column:
    """Deterministic legal sentence bundle per doc_id: one section header
    line, a statute obligation, a rotating shall/shall-not/may clause, a
    party recital + designation (round 3, E9 parties), case + CFR
    citations, and a definition carrying an ISO date and an amount."""
    d = F.col("doc_id")

    def s(e):
        return e.cast("string")

    party_a = F.lit(_PARTY_A[0])
    for i, p in enumerate(_PARTY_A[1:], start=1):
        party_a = F.when(d % 4 == i, F.lit(p)).otherwise(party_a)
    party_b = F.lit(_PARTY_B[0])
    for i, p in enumerate(_PARTY_B[1:], start=1):
        party_b = F.when(d % 3 == i, F.lit(p)).otherwise(party_b)

    return F.concat(
        F.lit("Section "), s(d % 40 + 1), F.lit(": Delivery Terms for lot "),
        s(d), F.lit(".\n"),
        F.lit("The supplier shall deliver all goods under 42 U.S.C. § "),
        s(1900 + d % 100), F.lit(". "),
        F.when(d % 3 == 0, F.lit("The buyer shall not disclose pricing terms. "))
         .when(d % 3 == 1, F.lit("The buyer may inspect all goods. "))
         .otherwise(F.lit("The parties shall meet quarterly. ")),
        F.lit("This agreement is between "), party_a, F.lit(" and "),
        party_b, F.lit(". Vendor: "), party_b, F.lit(". "),
        F.lit("See "), s(d % 500 + 1), F.lit(" F.3d "), s(d % 900 + 10),
        F.lit(" and "), s(d % 50 + 1), F.lit(" CFR 1910."), s(d % 10),
        F.lit(". "),
        F.lit('"Agreement" means the contract effective 2026-0'),
        s(d % 9 + 1), F.lit("-15 with payment of $"), s(d % 90 + 10),
        F.lit(",500.00 due."),
    )


# the same synthesis as ANSI SQL (chr(10) = the '\n' literal; DuckDB does
# not interpret backslash escapes in standard strings)
_LEGAL_TEXT_SQL = """
    'Section ' || CAST(doc_id % 40 + 1 AS VARCHAR)
    || ': Delivery Terms for lot ' || CAST(doc_id AS VARCHAR) || '.' || chr(10)
    || 'The supplier shall deliver all goods under 42 U.S.C. § '
    || CAST(1900 + doc_id % 100 AS VARCHAR) || '. '
    || CASE WHEN doc_id % 3 = 0 THEN 'The buyer shall not disclose pricing terms. '
            WHEN doc_id % 3 = 1 THEN 'The buyer may inspect all goods. '
            ELSE 'The parties shall meet quarterly. ' END
    || 'This agreement is between '
    || CASE WHEN doc_id % 4 = 1 THEN 'Globex Inc'
            WHEN doc_id % 4 = 2 THEN 'Initech Ltd'
            WHEN doc_id % 4 = 3 THEN 'Umbrella Co'
            ELSE 'Acme Corp' END
    || ' and '
    || CASE WHEN doc_id % 3 = 1 THEN 'Wayne Enterprises'
            WHEN doc_id % 3 = 2 THEN 'Hooli Inc'
            ELSE 'Stark Industries' END
    || '. Vendor: '
    || CASE WHEN doc_id % 3 = 1 THEN 'Wayne Enterprises'
            WHEN doc_id % 3 = 2 THEN 'Hooli Inc'
            ELSE 'Stark Industries' END
    || '. '
    || 'See ' || CAST(doc_id % 500 + 1 AS VARCHAR)
    || ' F.3d ' || CAST(doc_id % 900 + 10 AS VARCHAR)
    || ' and ' || CAST(doc_id % 50 + 1 AS VARCHAR)
    || ' CFR 1910.' || CAST(doc_id % 10 AS VARCHAR) || '. '
    || '"Agreement" means the contract effective 2026-0'
    || CAST(doc_id % 9 + 1 AS VARCHAR)
    || '-15 with payment of $' || CAST(doc_id % 90 + 10 AS VARCHAR)
    || ',500.00 due.'
"""


def _legal_docs(spark, sf_dir, limit: int):
    return (_t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < limit)
            .select("doc_id", _synth_legal_text().alias("text")))


def q_legal_citations(spark, sf_dir):
    """E8: statute / case / CFR citation extraction (ref :112-131)."""
    from ..operators import legal_ner
    return (legal_ner.extract_citations(_legal_docs(spark, sf_dir, 60))
            .orderBy("doc_id", "ctype", "cite"))


def q_legal_obligations(spark, sf_dir):
    """E8/E9: sentence-level shall / shall not / may classification
    (ref :134-136, :204-210)."""
    from ..operators import legal_ner
    return (legal_ner.obligation_counts(_legal_docs(spark, sf_dir, 120))
            .orderBy("doc_id"))


def q_legal_definitions(spark, sf_dir):
    """E9: '"X" means ...' definition extraction (ref :212-219)."""
    from ..operators import legal_ner
    return (legal_ner.extract_definitions(_legal_docs(spark, sf_dir, 60))
            .orderBy("doc_id"))


def q_legal_sections(spark, sf_dir):
    """E9: section-header extraction (ref :221-228)."""
    from ..operators import legal_ner
    return (legal_ner.extract_sections(_legal_docs(spark, sf_dir, 60))
            .orderBy("doc_id"))


def q_legal_parties(spark, sf_dir):
    """E9 (round 3): party extraction — the 'between X and Y' recital +
    'Vendor: NAME' designation (deterministic stand-in for the reference's
    spaCy PERSON/ORG party resolution, ref :189-197)."""
    from ..operators import legal_ner
    return (legal_ner.extract_parties(_legal_docs(spark, sf_dir, 80))
            .orderBy("doc_id", "role", "party"))


def q_legal_dates_amounts(spark, sf_dir):
    """E9: DATE/MONEY extraction (deterministic stand-ins for the
    reference's spaCy NER classes, ref :194-202)."""
    from ..operators import legal_ner
    return (legal_ner.extract_dates_amounts(_legal_docs(spark, sf_dir, 60))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# Embedding / similarity surface
# ---------------------------------------------------------------------------

def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector (Q3/Q4
    analogue). Rank-only output for cross-engine float stability."""
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    top = similarity.brute_force_topk(
        e.filter(F.col("vec_id") != 0), qvec, k=10)
    w = Window.orderBy(F.desc("score"), "vec_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "vec_id"))


def q_cosine_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (bounded brute force)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    return (a.crossJoin(b).filter(F.col("a") < F.col("b"))
            .withColumn("score", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("score") >= 0.25)
            .select("a", "b")
            .orderBy("a", "b"))


def q_knn_join(spark, sf_dir):
    """k-NN join: top-3 neighbors for each of the first 20 vectors."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    return (similarity.knn_join(e, q, k=3)
            .select("qid", "nbr", "rank")
            .orderBy("qid", "rank"))


def q_label_centroid_norms(spark, sf_dir):
    """Per-label centroid L2 norm (round-3: the query now computes what its
    name says). Cross-engine-EXACT float discipline: components scale to
    integer micro-units (round(v*1e6) → exact per-(label,dim) BIGINT sums
    S_dim), squares accumulate exactly (decimal(38,0) here, HUGEINT in the
    oracle), and the single lossy step — sqrt — runs on the IDENTICAL
    exact integer on both engines, so the IEEE doubles (and the rounded
    output) are bit-equal.  norm = sqrt(Σ S_dim²) / (n_vectors·1e6).

    Input domain: |component| < ~9.2e12 (BIGINT range / 1e6). Embedding
    components outside it overflow the micro-unit cast and fail LOUDLY
    under ANSI (pinned in the edge-corpus smoke suite) — the exactness
    contract forbids silently clamping them."""
    e = _t(spark, sf_dir, "embeddings")
    comp = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    per_dim = comp.groupBy("label", "dim").agg(
        F.sum(F.round(F.col("v") * 1000000).cast("long")).alias("s"),
        F.count("*").alias("n"))
    sq = F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(19,0)")
    agg = per_dim.groupBy("label").agg(
        F.sum(sq).alias("ss"),
        F.max("n").alias("n_vectors"),
        F.count("*").alias("n_dims"))
    return (agg.select(
        "label", "n_vectors", "n_dims",
        F.round(F.sqrt(F.col("ss").cast("double"))
                / (F.col("n_vectors") * 1000000.0), 4).alias("centroid_norm"))
        .orderBy("label"))


def q_doc_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (round 3): cosine pairs ≥ 0.40 →
    connected components → min-id representative. Output: the non-trivial
    semantic clusters (rep, n_members). Oracle closes the transitive
    reachability with a recursive CTE; the Spark side dispatches like
    canonical_mapping (driver union-find under the probe threshold,
    star contraction above — both reach the exact fixpoint regardless
    of chain diameter) — value-verified."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    mapping = dedup.semantic_dedup(e, threshold=0.40)
    return (mapping.groupBy("rep")
            .agg(F.count("*").alias("n_members"))
            .filter(F.col("n_members") > 1)
            .orderBy("rep"))


def _word_edges(d, src="src", dst="dst", simple=True):
    """Adjacent-word digraph of a documents frame — the ONE Spark twin
    of the shared _WORD_EDGES_CTE oracle definition (four consumers:
    pagerank, triangle census, BFS, RA link prediction — previously four
    divergable copies, review finding round 3). ``simple=True`` drops
    self-loops and duplicate pairs here; the census/RA consumers pass
    ``simple=False`` because their operators canonicalize edges
    internally (tested: duplicates/self-loops don't change their
    output)."""
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")
    pairs = F.transform(
        safe_seq(F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias(src),
                           F.element_at(toks, i + 1).alias(dst)),
    )
    edges = (d.filter(F.size(toks) >= 2)
             .select(F.explode(pairs).alias("p"))
             .select(f"p.{src}", f"p.{dst}"))
    if simple:
        edges = (edges.filter(F.col(src) != F.col(dst)).distinct())
    return edges


def q_word_pagerank(spark, sf_dir):
    """Integer-exact PageRank (10 iterations, d=0.85) over the DISTINCT
    adjacent-word co-occurrence digraph of the documents corpus — graph
    analytics on text, value-verified bit-exact against a 10×-unrolled
    SQL oracle thanks to pagerank_exact's all-integer arithmetic."""
    from ..operators.components import pagerank_exact
    edges = _word_edges(_t(spark, sf_dir, "documents"))
    return (pagerank_exact(edges, n_iterations=10)
            .orderBy(F.desc("rank_units"), "id")
            .limit(25))


def q_doc_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    per-doc word/bigram duplication counts, all exact integers — the
    most-frequent-2-gram filter's inputs. Tie-break: lexicographic min
    bigram among the max-count ones."""
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")
    bigrams = F.transform(
        safe_seq(F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)),
    )
    per_doc = (d.filter(F.size(toks) >= 2)
               .select("doc_id",
                       F.size(toks).cast("long").alias("n_words"),
                       F.size(F.array_distinct(toks)).cast("long")
                        .alias("n_distinct_words"),
                       F.explode(bigrams).alias("bg")))
    bc = (per_doc.groupBy("doc_id", "n_words", "n_distinct_words", "bg")
          .agg(F.count("*").alias("c")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), "bg")
    return (bc.withColumn("rn", F.row_number().over(w))
            .withColumn("n_bigrams",
                        F.sum("c").over(Window.partitionBy("doc_id")))
            .filter(F.col("rn") == 1)
            .select("doc_id", "n_words", "n_distinct_words",
                    F.col("bg").alias("top_bigram"),
                    F.col("c").alias("top_bigram_n"),
                    "n_bigrams")
            .orderBy("doc_id"))


def q_doc_decontamination(spark, sf_dir):
    """Benchmark decontamination: docs 0-9 stand in for the eval
    benchmark; the rest of the corpus is flagged on any shared word
    5-gram. Broadcast-join plan — the corpus never shuffles on the
    shingle key (see dedup.ngram_contamination)."""
    d = _t(spark, sf_dir, "documents")
    out = dedup.ngram_contamination(
        d.filter(F.col("doc_id") >= 10), d.filter(F.col("doc_id") < 10),
        n=5)
    return (out.select(F.col("id").alias("doc_id"), "n_hits",
                       "n_distinct_hits", "n_shingles")
            .orderBy("doc_id"))


def q_doc_train_split(spark, sf_dir):
    """Deterministic hash train/val/test split (≈80/10/10): bucket = first
    two hex chars of md5(doc_id), compared lexicographically — engine-
    portable, shuffle-free at assignment time, stable under corpus growth
    (a doc's split never changes when neighbors are added/removed)."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (F.when(h < "cd", "train")
             .when(h < "e6", "val")
             .otherwise("test"))
    return (d.select(split.alias("split"), "lang")
            .groupBy("split", "lang").agg(F.count("*").alias("n_docs"))
            .orderBy("split", "lang"))


def q_word_graph_stats(spark, sf_dir):
    """Exact triangle census of the word co-occurrence graph — the
    degree-ordered wedge-closure algorithm (components.triangle_count),
    value-verified against a 3-way-self-join SQL oracle."""
    from ..operators.components import triangle_count
    edges = _word_edges(_t(spark, sf_dir, "documents"),
                        src="a", dst="b", simple=False)
    return triangle_count(edges)


def q_doc_length_quantiles(spark, sf_dir):
    """Per-lang exact length percentiles (type-7 linear interpolation on
    both engines; true values carry ≤2 decimals, so the 4-decimal round
    is never near a boundary — cross-engine stable)."""
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        *[F.round(F.percentile(F.col("n_chars"), p), 4).alias(a)
          for p, a in ((0.25, "p25"), (0.5, "p50"),
                       (0.75, "p75"), (0.9, "p90"))])
        .orderBy("lang"))


def q_word_bfs_distances(spark, sf_dir):
    """Depth-capped BFS shortest-path distances over the directed
    adjacent-word graph from its lexicographically smallest source word
    — value-verifies the iterative frontier-expansion traversal
    (components.bfs_distances) against a recursive-CTE oracle. The
    level-k anti-join must emit each word at its MINIMAL distance only
    (at sf0.01 one word is reachable only at depth 2 — a wrong
    frontier/visited interaction would surface it at depth 1)."""
    from ..operators.components import bfs_distances
    edges = _word_edges(_t(spark, sf_dir, "documents"))
    seeds = edges.agg(F.min("src").alias("id"))
    return bfs_distances(edges, seeds, max_depth=3).orderBy("dist", "id")


def q_doc_shingle_components(spark, sf_dir):
    """Duplicate-cluster discovery as graph connectivity: docs sharing
    any word 8-gram are edges; clusters are connected components. The
    distributed two-phase star contraction (connected_components_star)
    is invoked DIRECTLY — no driver union-find fast path — so this
    value-verifies the Kiveris et al. algorithm itself against a
    recursive-CTE transitive-closure oracle (at sf0.01: 23 components,
    sizes 2-3, isolated docs excluded by construction).

    Scale notes: the pair generator is the standard shingle-blocking
    self-join — shuffles on the shingle key; the ≤32-docs-per-shingle
    cap is the hot-shingle (boilerplate) guard that bounds per-key
    fan-out to O(cap²), the same skew discipline as minhash banding.
    At 100 TB the shingle string would be xxhash64-compressed before
    the shuffle (identical pair set modulo collisions)."""
    from ..operators.components import connected_components_star
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")
    shingles = F.transform(
        safe_seq(F.size(toks) - 7),
        lambda i: F.array_join(F.slice(toks, i, 8), " "),
    )
    sh = (d.filter(F.size(toks) >= 8)
          .select("doc_id", F.explode(F.array_distinct(shingles)).alias("g")))
    hot = (sh.groupBy("g").agg(F.count("*").alias("c"))
           .filter(F.col("c") > 32).select("g"))
    shf = sh.join(hot, "g", "left_anti")
    a = shf.select(F.col("g"), F.col("doc_id").alias("a"))
    b = shf.select(F.col("g"), F.col("doc_id").alias("b"))
    edges = (a.join(b, "g").filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    verts = (edges.select(F.col("a").alias("id"))
             .union(edges.select(F.col("b"))).distinct())
    return connected_components_star(verts, edges).orderBy("id")


def q_events_asof_purchase(spark, sf_dir):
    """Backward as-of join: each click matched to the SAME user's most
    recent purchase at-or-before it (temporal.asof_join — union + one
    running-last window, single shuffle). Value-verified against
    DuckDB's native ASOF JOIN — an independent implementation of the
    same semantics. purchase_value rides through un-rounded (both
    engines read the identical parquet double and do no arithmetic);
    the gap is exact integer microseconds."""
    from ..operators.temporal import asof_join, epoch_us
    ev = _t(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts",
                     F.col("value").alias("purchase_value")))
    out = asof_join(clicks, purch, on="user_id",
                    value_cols=["purchase_value"])
    return (out.select(
        "event_id", "user_id", "purchase_value",
        (epoch_us(F.col("ts")) - epoch_us(F.col("_asof_ts")))
        .alias("us_since_purchase"))
        .orderBy("event_id"))


def q_events_range_join(spark, sf_dir):
    """Bounded-interval range join: (click, purchase) pairs of the same
    user with the purchase 0-3600 s after the click
    (temporal.range_join_bucketed — time-bucketed equi-join + exact
    microsecond trim, never a theta-join). Oracle is the plain
    inequality join DuckDB can afford at this scale."""
    from ..operators.temporal import epoch_us, range_join_bucketed
    ev = _t(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    out = range_join_bucketed(clicks, purch, on="user_id",
                              lower_s=0, upper_s=3600)
    return (out.select(
        F.col("l_event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.col("l_user_id").alias("user_id"),
        (epoch_us(F.col("r_ts")) - epoch_us(F.col("l_ts")))
        .alias("gap_us"))
        .orderBy("click_id", "purchase_id"))


def _with_injected_pii(d, out_col="text"):
    """Deterministically splice synthetic PII into the corpus text —
    identically reproduced in the DuckDB oracle — so the redaction
    operator has non-trivial, per-doc-varying work to verify (the
    synthetic corpus itself contains no emails/phones/IPs). Which PII
    kinds a doc gets is a function of doc_id (≈2/3 get an email, 1/2 an
    IP, 1/2 a phone; some get all three, some none)."""
    did = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    email = F.when(did % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit(" u"), s(did), F.lit("@ex"), s(did % 7),
                 F.lit(".com")))
    ip = F.when(did % 2 == 0,
                F.concat(F.lit(" ip 10."), s(did % 256), F.lit(".0."),
                         s((did * 7) % 256))).otherwise(F.lit(""))
    phone = F.when(did % 4 < 2,
                   F.concat(F.lit(" tel 555-"),
                            F.lpad(s(did % 1000), 3, "0"), F.lit("-"),
                            F.lpad(s((did * 13) % 10000), 4, "0"))
                   ).otherwise(F.lit(""))
    return d.withColumn(
        out_col, F.concat(F.col("text"), email, ip, phone))


def q_doc_pii_redaction(spark, sf_dir):
    """PII detection + masking audit (operators/pii.py) over the corpus
    with deterministically injected emails/IPv4s/phones: per-doc exact
    match counts plus the md5 of the fully redacted text — the digest
    value-verifies the exact redacted BYTES against DuckDB running the
    very same Java∩RE2 patterns. Pure codegen string expressions,
    zero shuffle (see pii.py scale notes)."""
    from ..operators import pii
    d = _with_injected_pii(_t(spark, sf_dir, "documents"))
    return pii.pii_report(d, "doc_id").orderBy("doc_id")


def q_word_link_prediction(spark, sf_dir):
    """Resource-Allocation link prediction over the undirected word
    co-occurrence graph (components.link_prediction_ra): top-25
    non-adjacent pairs by Σ 1/deg(common neighbor), integer-exact via
    scale-div units. Hub apexes above degree 40 are dropped BEFORE the
    wedge self-join on BOTH engines (the power-law last-reducer
    guard — at crawl scale the hubs are stopword-like tokens)."""
    from ..operators.components import link_prediction_ra
    edges = _word_edges(_t(spark, sf_dir, "documents"),
                        src="a", dst="b", simple=False)
    return (link_prediction_ra(edges, max_degree=40)
            .orderBy(F.desc("ra_score_units"), "x", "y")
            .limit(25))


def q_doc_dup_span_mass(spark, sf_dir):
    """Per-doc duplicated-span mass (dedup.duplicate_shingle_mass):
    the fraction of a doc's distinct word 8-grams that occur verbatim in
    ANOTHER doc — the Dolma/RefinedWeb paragraph-dedup signal with
    all-integer output. Emits only the contaminated docs."""
    d = _t(spark, sf_dir, "documents")
    return (dedup.duplicate_shingle_mass(d, n=8)
            .filter(F.col("n_dup_shingles") > 0)
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))


def q_doc_dup_span_removal(spark, sf_dir):
    """ExactSubstr-style duplicate-span REMOVAL
    (dedup.remove_duplicate_spans): every token covered by a non-first
    occurrence of a corpus-duplicated word 8-gram is removed, each doc
    reconstructed from its survivors and digested. One row per doc —
    clean docs report n_removed = 0, so the digest column is a
    byte-level check on the full rewritten corpus."""
    from ..operators.dedup import remove_duplicate_spans
    d = _t(spark, sf_dir, "documents")
    return (remove_duplicate_spans(d, n=8)
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))


def q_brand_revenue_salted(spark, sf_dir):
    """Hot-key-safe revenue rollup: lineitem ⋈ broadcast(part) then the
    TWO-PHASE salted aggregation (skew.salted_sum, 16-way salt from
    l_orderkey) by p_brand — bit-identical to the plain groupBy the
    oracle runs, but the wide shuffle carries ≤ brands×16 partial rows,
    so one hot brand fans across 16 reducers instead of one."""
    from ..operators.skew import salted_sum
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    out = salted_sum(
        j, ["p_brand"],
        {"revenue_cents": _cents(F.col("l_extendedprice")
                                 * (1 - F.col("l_discount")))},
        salt_col="l_orderkey", n_salts=16, count_alias="n_items")
    return out.orderBy("p_brand")


def q_events_hopping_counts(spark, sf_dir):
    """Hopping (sliding) window counts: 2-hour windows every 30 minutes
    — each event lands in exactly 4 windows. The oracle reconstructs
    Spark's epoch-aligned window family via time_bucket minus k·slide,
    k ∈ 0..3; tz-free arithmetic on both engines."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "n_events")
            .orderBy("window_start"))


def q_doc_filter_funnel(spark, sf_dir):
    """The composed training-data filter funnel — each doc gets its FIRST
    matching drop reason (C4/Gopher-style first-match routing, so the
    per-reason counts form a proper funnel): too_short (<20 tokens) →
    bad_word_len (avg word length outside [3,10], exact integer compare)
    → pii_heavy (≥3 real regex hits on the PII-injected text, the same
    operators/pii.py patterns) → near_dup_prefix (64-char-prefix md5
    seen on a smaller doc_id) → repetitive (distinct-token ratio <0.4,
    integer compare) → keep. Output: (verdict, lang, n_docs). Every
    signal is pure codegen; the only shuffles are the fingerprint
    aggregation and the final count."""
    from ..operators import pii
    d = _with_injected_pii(_t(spark, sf_dir, "documents"),
                           out_col="pii_text")
    n_tok = F.size(F.split(F.col("text"), " "))
    n_distinct = F.size(F.array_distinct(F.split(F.col("text"), " ")))
    n_pii = sum(F.regexp_count(F.col("pii_text"), F.lit(pat))
                for _, pat, _ in pii.PII_PATTERNS)
    feats = d.select(
        "doc_id", "lang",
        n_tok.alias("n_tok"), n_distinct.alias("n_distinct"),
        (F.col("n_chars") - (n_tok - 1)).alias("chars_wo_sp"),
        F.md5(F.substring(F.col("text"), 1, 64)).alias("h"),
        n_pii.alias("n_pii"))
    dup = feats.groupBy("h").agg(F.min("doc_id").alias("keeper"),
                                 F.count("*").alias("c"))
    j = feats.join(dup, "h")
    verdict = (
        F.when(F.col("n_tok") < 20, "too_short")
        .when((F.col("chars_wo_sp") < 3 * F.col("n_tok"))
              | (F.col("chars_wo_sp") > 10 * F.col("n_tok")),
              "bad_word_len")
        .when(F.col("n_pii") >= 3, "pii_heavy")
        .when((F.col("c") > 1) & (F.col("doc_id") != F.col("keeper")),
              "near_dup_prefix")
        .when(10 * F.col("n_distinct") < 4 * F.col("n_tok"), "repetitive")
        .otherwise("keep"))
    return (j.groupBy(verdict.alias("verdict"), F.col("lang"))
            .agg(F.count("*").alias("n_docs"))
            .orderBy("verdict", "lang"))


def _pagerank_oracle_sql(edge_cte: str, n_iter: int = 10,
                         damping_pct: int = 85, scale: int = 10 ** 12,
                         k: int = 25) -> str:
    """Unrolled-iteration SQL twin of components.pagerank_exact: one CTE
    per iteration, identical integer arithmetic (``//`` in DuckDB ≡
    ``div`` in Spark for the all-positive operands here). Inner
    CAST(SUM(..) AS BIGINT) guards the HUGEINT→float64 pandas artifact."""
    keep = 100 - damping_pct
    parts = [
        f"WITH edges AS ({edge_cte}),",
        "nodes AS (SELECT DISTINCT src AS id FROM edges"
        " UNION SELECT DISTINCT dst FROM edges),",
        "nn AS (SELECT COUNT(*) AS n FROM nodes),",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        "e AS (SELECT edges.src, edges.dst, deg.outdeg"
        " FROM edges JOIN deg ON edges.src = deg.src),",
        f"r0 AS (SELECT id, {scale} // nn.n AS rank_units"
        " FROM nodes CROSS JOIN nn),",
    ]
    for i in range(n_iter):
        parts.append(
            f"r{i + 1} AS (SELECT nodes.id, "
            f"({scale} * {keep} // 100) // nn.n + COALESCE(s.contrib, 0)"
            " AS rank_units FROM nodes CROSS JOIN nn LEFT JOIN ("
            f"SELECT e.dst AS id, CAST(SUM(((r{i}.rank_units"
            f" * {damping_pct}) // 100) // e.outdeg) AS BIGINT) AS contrib"
            f" FROM e JOIN r{i} ON e.src = r{i}.id GROUP BY e.dst"
            ") s ON nodes.id = s.id),")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, rank_units FROM r{n_iter}"
                 f" ORDER BY rank_units DESC, id LIMIT {k}")
    return "\n".join(parts)


_WORD_EDGES_CTE = """
    SELECT DISTINCT w[i] AS src, w[i+1] AS dst
    FROM (SELECT string_split(text, ' ') w FROM documents) t,
         unnest(range(1, len(w))) r(i)
    WHERE len(w) >= 2 AND w[i] <> w[i+1]
"""


# ---------------------------------------------------------------------------
# ORACLE SQL (DuckDB) — same names, same column aliases
# ---------------------------------------------------------------------------

ORACLE_SQL: Dict[str, str] = {
    # NOTE (round-2 fix): DuckDB SUM(BIGINT) returns HUGEINT → pandas
    # float64, which breaks the driver's dtype-sensitive value hash against
    # Spark's int64 even when values are equal. Every integer SUM below is
    # therefore wrapped in an outer CAST(SUM(...) AS BIGINT).
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
               COUNT(*) AS count_order,
               ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) / COUNT(*), 4) AS avg_qty,
               ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / COUNT(*), 4) AS avg_price_cents
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY spend_cents DESC, c_custkey
        LIMIT 10
    """,
    "region_revenue": """
        SELECT r_name,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "order_priority_counts": """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "market_segment_stats": """
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
               ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_acctbal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "events_latest_per_user": """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
    "events_type_stats": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
               ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*), 4) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "user_sessions": """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(epoch(ts)) OVER w IS NULL
                             OR epoch(ts) - lag(epoch(ts)) OVER w >= 1800.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            -- ordered by (ts, event_id) to MATCH the flagged CTE and the
            -- Spark window (round-3: the old ORDER BY event_id was correct
            -- only because MAX(sess) is order-invariant; per-event session
            -- ids would have silently diverged)
            SELECT user_id, event_id,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM flagged
        )
        SELECT user_id,
               CAST(MAX(sess) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id ORDER BY user_id
    """,
    "nations_without_suppliers": """
        SELECT n_name FROM nation
        WHERE n_nationkey NOT IN
              (SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
        ORDER BY n_name
    """,
    "part_type_counts": """
        SELECT p_type, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS retail_cents
        FROM part WHERE p_size > 25
        GROUP BY p_type ORDER BY p_type
    """,
    "orders_priority_rollup": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
    "urgent_and_high_customers": """
        SELECT custkey FROM (
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '2-HIGH'
        ) ORDER BY custkey
    """,
    "events_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
        ORDER BY event_id
    """,
    "doc_lang_counts": """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "doc_token_stats": """
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
               ROUND((n_chars - (len(string_split(text, ' ')) - 1))
                     / len(string_split(text, ' ')), 4) AS avg_token_len
        FROM documents
        ORDER BY n_tokens DESC, doc_id LIMIT 20
    """,
    "doc_exact_dedup": """
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_docs,
               COUNT(*) AS n_distinct_texts,
               CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_docs
        FROM (SELECT lang, md5(substr(text, 1, 32)) h, COUNT(*) c
              FROM documents GROUP BY 1, 2)
        GROUP BY lang ORDER BY lang
    """,
    "doc_stopword_ratio": """
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','to','is'))) AS n_stopword_hits
        FROM documents
        WHERE len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','to','is'))) > 0
        ORDER BY n_stopword_hits DESC, doc_id LIMIT 25
    """,
    "word_cooccurrence": """
        WITH t AS (SELECT string_split(text, ' ') w FROM documents),
        pairs AS (
            SELECT w[i] AS subj, w[i+1] AS obj
            FROM t, unnest(range(1, len(w))) r(i)
            WHERE len(w) >= 2
        )
        SELECT subj, obj, COUNT(*) AS n FROM pairs
        GROUP BY subj, obj ORDER BY n DESC, subj, obj LIMIT 25
    """,
    "doc_fingerprint": """
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(substr(text, 1, 64))) AS n_distinct_fp
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "ngram_jaccard_pairs": """
        WITH sh AS (
            SELECT doc_id AS key,
                   list_distinct(list_transform(
                       range(1, greatest(len(string_split(lower(trim(text)), ' ')) - 1, 1) + 1),
                       i -> array_to_string(string_split(lower(trim(text)), ' ')[i:i+1], ' ')
                   )) AS shingles
            FROM documents WHERE doc_id < 300
        )
        SELECT a.key AS a, b.key AS b,
               len(list_intersect(a.shingles, b.shingles))
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))) AS jaccard
        FROM sh a, sh b
        WHERE a.key < b.key
          AND len(list_intersect(a.shingles, b.shingles))
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= 0.12
        ORDER BY a, b
    """,
    "doc_lang_id": """
        WITH h AS (
            SELECT lang,
                   len(list_filter(string_split(lower(text), ' '),
                       x -> x IN ('der','die','das','und','nicht','ist'))) AS h_de,
                   len(list_filter(string_split(lower(text), ' '),
                       x -> x IN ('the','of','and','to','is','a'))) AS h_en,
                   len(list_filter(string_split(lower(text), ' '),
                       x -> x IN ('el','los','las','es','una','de'))) AS h_es,
                   len(list_filter(string_split(lower(text), ' '),
                       x -> x IN ('le','la','les','et','est','une'))) AS h_fr,
                   len(list_filter(string_split(lower(text), ' '),
                       x -> x IN ('a','je','na','sa','to','v'))) AS h_sk
            FROM documents
        ), p AS (
            SELECT lang,
                   CASE WHEN greatest(h_de,h_en,h_es,h_fr,h_sk) = 0 THEN 'und'
                        WHEN h_de = greatest(h_de,h_en,h_es,h_fr,h_sk) THEN 'de'
                        WHEN h_en = greatest(h_de,h_en,h_es,h_fr,h_sk) THEN 'en'
                        WHEN h_es = greatest(h_de,h_en,h_es,h_fr,h_sk) THEN 'es'
                        WHEN h_fr = greatest(h_de,h_en,h_es,h_fr,h_sk) THEN 'fr'
                        ELSE 'sk' END AS predicted
            FROM h
        )
        SELECT lang, predicted, COUNT(*) AS n FROM p
        GROUP BY lang, predicted ORDER BY lang, predicted
    """,
    "doc_quality": """
        WITH q AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   (n_chars - (len(string_split(text, ' ')) - 1))
                       / len(string_split(text, ' ')) AS avg_wl,
                   length(text) - length(translate(text, '.,!?;:', '')) AS n_punct,
                   n_chars
            FROM documents
        )
        SELECT doc_id, n_tokens,
               ROUND((least(n_tokens / 50.0, 1.0)
                      + (CASE WHEN avg_wl >= 3 AND avg_wl <= 10
                              THEN 1.0 ELSE 0.5 END)
                      + (1.0 - least(n_punct * 5.0 / greatest(n_chars, 1),
                                     1.0))) / 3.0,
                     4) AS quality
        FROM q
        ORDER BY quality DESC, doc_id LIMIT 20
    """,
    "doc_regex_tokens": """
        SELECT doc_id,
               len(regexp_extract_all(lower(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_regex_tokens,
               len(string_split(text, ' ')) AS n_ws_tokens
        FROM documents
        ORDER BY n_regex_tokens DESC, doc_id LIMIT 20
    """,
    "doc_winnow_fingerprint": """
        WITH fp AS (
            SELECT lang,
                   list_aggregate(list_transform(
                       range(1, greatest(length(text) - 15, 1) + 1, 4),
                       i -> md5(substring(lower(text), i, 16))), 'min') AS fp
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(DISTINCT fp) AS n_distinct_fp
        FROM fp GROUP BY lang ORDER BY lang
    """,
    "events_hourly_stream_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "doc_classification": """
        SELECT doc_id, lang,
               CASE WHEN text LIKE '%stream%' THEN 'Streaming'
                    WHEN text LIKE '%vector%' THEN 'VectorSearch'
                    WHEN text LIKE '%window%' THEN 'Windowed'
                    WHEN text LIKE '%join%' THEN 'Relational'
                    ELSE 'General' END AS doc_type,
               CASE WHEN text LIKE '%stream%' THEN CAST(least(
                        (length(text) - length(replace(text, 'stream', ''))) / 6,
                        100) AS INT)
                    WHEN text LIKE '%vector%' THEN CAST(least(
                        (length(text) - length(replace(text, 'vector', ''))) / 6,
                        100) AS INT)
                    WHEN text LIKE '%window%' THEN CAST(least(
                        (length(text) - length(replace(text, 'window', ''))) / 6,
                        100) AS INT)
                    WHEN text LIKE '%join%' THEN CAST(least(
                        (length(text) - length(replace(text, 'join', ''))) / 4,
                        100) AS INT)
                    ELSE 0 END AS confidence
        FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    "orders_monthly_revenue": """
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders GROUP BY yr, mo ORDER BY yr, mo
    """,
    "ship_delay_stats": """
        WITH d AS (
            SELECT date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS delay_days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT CAST(floor(delay_days / 7.0) AS BIGINT) AS delay_week,
               COUNT(*) AS n,
               CAST(SUM(delay_days) AS BIGINT) AS sum_delay_days,
               MIN(delay_days) AS min_delay, MAX(delay_days) AS max_delay
        FROM d GROUP BY delay_week ORDER BY delay_week
    """,
    # legal NER (E8/E9): identical deterministic text synthesis on both
    # sides; the regex extraction is the verified behavior. Pattern strings
    # are the RE2 ∩ Java-regex subset of operators/legal_ner.py.
    "legal_citations": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 60),
        c AS (
            SELECT doc_id, 'STATUTE' AS ctype,
                   unnest(regexp_extract_all(text,
                       '(?i)\\d+\\s+u\\.?s\\.?c\\.?\\s+(?:§|section)\\s+\\d+')) AS cite
            FROM lt
            UNION ALL
            SELECT doc_id, 'CASE_CITATION',
                   unnest(regexp_extract_all(text, '\\d+\\s+F\\.\\d?d?\\s+\\d+'))
            FROM lt
            UNION ALL
            SELECT doc_id, 'REGULATION',
                   unnest(regexp_extract_all(text, '\\d+\\s+CFR\\s+\\d+(?:\\.\\d+)?'))
            FROM lt
        )
        SELECT doc_id, ctype, cite FROM c ORDER BY doc_id, ctype, cite
    """,
    "legal_obligations": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 120),
        s AS (SELECT doc_id,
                     regexp_split_to_array(lower(text), '\\.\\s+') AS sents
              FROM lt)
        SELECT doc_id,
               len(list_filter(sents, x -> regexp_matches(x, '\\bshall\\b')))
                 - len(list_filter(sents, x -> regexp_matches(x, '\\bshall not\\b')))
                 AS n_obligation,
               len(list_filter(sents, x -> regexp_matches(x, '\\bshall not\\b')))
                 AS n_prohibition,
               len(list_filter(sents, x -> regexp_matches(x, '\\bmay\\b')))
                 AS n_permission
        FROM s ORDER BY doc_id
    """,
    "legal_definitions": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 60),
        d AS (SELECT doc_id,
                     regexp_extract(text,
                         '(?i)"([^"]+)"\\s+(?:means?|refers? to|is defined as)\\s+([^.]+\\.)',
                         1) AS term,
                     regexp_extract(text,
                         '(?i)"([^"]+)"\\s+(?:means?|refers? to|is defined as)\\s+([^.]+\\.)',
                         2) AS definition
              FROM lt)
        SELECT doc_id, term, definition FROM d
        WHERE term <> '' ORDER BY doc_id
    """,
    "legal_sections": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 60),
        d AS (SELECT doc_id,
                     regexp_extract(text,
                         '(?:Section|Article|§)\\s+(\\d+(?:\\.\\d+)*)[:.]?\\s*([^\\n]+)',
                         1) AS sec_number,
                     regexp_extract(text,
                         '(?:Section|Article|§)\\s+(\\d+(?:\\.\\d+)*)[:.]?\\s*([^\\n]+)',
                         2) AS sec_title
              FROM lt)
        SELECT doc_id, sec_number, sec_title FROM d
        WHERE sec_number <> '' ORDER BY doc_id
    """,
    "legal_parties": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 80),
        p AS (
            SELECT doc_id, 'PARTY_A' AS role,
                   regexp_extract(text,
                       'between\\s+([A-Z][A-Za-z]+(?:\\s+[A-Z][A-Za-z]+)*)\\s+and\\s+([A-Z][A-Za-z]+(?:\\s+[A-Z][A-Za-z]+)*)',
                       1) AS party
            FROM lt
            UNION ALL
            SELECT doc_id, 'PARTY_B',
                   regexp_extract(text,
                       'between\\s+([A-Z][A-Za-z]+(?:\\s+[A-Z][A-Za-z]+)*)\\s+and\\s+([A-Z][A-Za-z]+(?:\\s+[A-Z][A-Za-z]+)*)',
                       2)
            FROM lt
            UNION ALL
            SELECT doc_id, 'NAMED',
                   regexp_extract(text,
                       '(?:Party|Client|Vendor):\\s+([A-Z][A-Za-z]+(?:\\s+[A-Z][A-Za-z]+)*)',
                       1)
            FROM lt
        )
        SELECT doc_id, role, party FROM p
        WHERE party <> '' ORDER BY doc_id, role, party
    """,
    "legal_dates_amounts": """
        WITH lt AS (SELECT doc_id, {legal_text} AS text
                    FROM documents WHERE doc_id < 60)
        SELECT doc_id,
               regexp_extract(text, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0) AS eff_date,
               regexp_extract(text, '\\$\\d+(?:,\\d{{3}})*(?:\\.\\d{{2}})?', 0) AS amount
        FROM lt ORDER BY doc_id
    """,
    "cosine_topk": """
        WITH q AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding::DOUBLE[], q.v), 4) AS score
            FROM embeddings, q WHERE vec_id <> 0
        )
        SELECT ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rank, vec_id
        FROM scored ORDER BY score DESC, vec_id LIMIT 10
    """,
    "cosine_near_dup_pairs": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id < 100)
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM e a, e b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.v, b.v) >= 0.25
        ORDER BY a, b
    """,
    "knn_join": """
        WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] vq FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id nbr, embedding::DOUBLE[] vc FROM embeddings),
        scored AS (
            SELECT qid, nbr,
                   ROUND(list_cosine_similarity(vq, vc), 4) AS score
            FROM q, c WHERE qid <> nbr
        )
        SELECT qid, nbr, rank FROM (
            SELECT qid, nbr,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, nbr) AS rank
            FROM scored
        ) WHERE rank <= 3 ORDER BY qid, rank
    """,
    "label_centroid_norms": """
        WITH comp AS (
            SELECT label,
                   unnest(range(len(embedding))) AS dim,
                   unnest(embedding::DOUBLE[]) AS v
            FROM embeddings
        ), per_dim AS (
            SELECT label, dim,
                   CAST(SUM(CAST(ROUND(v * 1000000) AS BIGINT)) AS BIGINT) AS s,
                   COUNT(*) AS n
            FROM comp GROUP BY label, dim
        ), agg AS (
            SELECT label,
                   SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS ss,
                   MAX(n) AS n_vectors,
                   COUNT(*) AS n_dims
            FROM per_dim GROUP BY label
        )
        SELECT label, n_vectors, n_dims,
               ROUND(sqrt(CAST(ss AS DOUBLE)) / (n_vectors * 1000000.0), 4)
                 AS centroid_norm
        FROM agg ORDER BY label
    """,
}


def _taxonomy_case_sql(rules, default: str, conf: bool) -> str:
    """Generate the oracle's classification CASE chain FROM the engine's
    rule list (single source of truth — the SQL can never drift from
    keyword_classify's precedence or confidence arithmetic). Division is
    exact: length diffs are multiples of len(kw), so DuckDB's rounding
    INT cast and Spark's truncating one agree."""
    parts = []
    for kw, cat in rules:
        kw_sql = kw.replace("'", "''")
        if conf:
            expr = (f"CAST(least((length(text) - "
                    f"length(replace(text, '{kw_sql}', ''))) / {len(kw)}, "
                    f"100) AS INT)")
        else:
            cat_sql = cat.replace("'", "''")
            expr = f"'{cat_sql}'"
        parts.append(f"WHEN text LIKE '%{kw_sql}%' THEN {expr}")
    else_sql = "0" if conf else f"'{default}'"
    return "CASE " + " ".join(parts) + f" ELSE {else_sql} END"


def _taxonomy_oracle_sql() -> str:
    from ..operators.classify import LEGAL_AREA_RULES, LEGISLATION_RULES
    text_case = "CASE " + " ".join(
        "WHEN doc_id % 5 = {} THEN '{}'".format(i, s.replace("'", "''"))
        for i, s in enumerate(_TAXONOMY_TEXTS)) + " END"
    return f"""
        WITH lt AS (SELECT doc_id, lower({text_case}) AS text
                    FROM documents WHERE doc_id < 150)
        SELECT doc_id,
               {_taxonomy_case_sql(LEGISLATION_RULES, '(Ostatné)', False)}
                 AS type_legislation,
               {_taxonomy_case_sql(LEGISLATION_RULES, '(Ostatné)', True)}
                 AS leg_confidence,
               {_taxonomy_case_sql(LEGAL_AREA_RULES, '(Ostatné)', False)}
                 AS type_category,
               {_taxonomy_case_sql(LEGAL_AREA_RULES, '(Ostatné)', True)}
                 AS cat_confidence
        FROM lt ORDER BY doc_id
    """


ORACLE_SQL["doc_taxonomy_classification"] = _taxonomy_oracle_sql()

ORACLE_SQL["word_pagerank"] = _pagerank_oracle_sql(_WORD_EDGES_CTE)

# UNION-distinct recursion: the working set is (id, dist) pairs not seen
# before, so each id appears at most max_depth+1 times and the recursion
# terminates; MIN(dist) collapses to the BFS distance function.
ORACLE_SQL["word_bfs_distances"] = f"""
    WITH RECURSIVE edges AS ({_WORD_EDGES_CTE}),
    seedv AS (SELECT MIN(src) AS s FROM edges),
    reach(id, dist) AS (
        SELECT s, 0 FROM seedv
        UNION
        SELECT e.dst, r.dist + 1
        FROM reach r JOIN edges e ON e.src = r.id
        WHERE r.dist < 3
    )
    SELECT id, CAST(MIN(dist) AS INTEGER) AS dist
    FROM reach GROUP BY id ORDER BY dist, id
"""

ORACLE_SQL["events_asof_purchase"] = """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
    purch AS (SELECT user_id, ts, value AS purchase_value FROM events
              WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, p.purchase_value,
           epoch_us(c.ts) - epoch_us(p.ts) AS us_since_purchase
    FROM clicks c ASOF JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
"""

ORACLE_SQL["events_range_join"] = """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
    purch AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM clicks c JOIN purch p ON c.user_id = p.user_id
    WHERE epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000
    ORDER BY click_id, purchase_id
"""

ORACLE_SQL["doc_shingle_components"] = """
    WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') w
                         FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  list_aggregate(w[i:i+7], 'string_agg', ' ') AS g
           FROM t, unnest(range(1, len(w) - 6)) r(i) WHERE len(w) >= 8),
    ok AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 32),
    shf AS (SELECT sh.* FROM sh JOIN ok USING (g)),
    edges AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
              FROM shf a JOIN shf b
              ON a.g = b.g AND a.doc_id < b.doc_id),
    nodes AS (SELECT a AS id FROM edges UNION SELECT b FROM edges),
    sym AS (SELECT a AS u, b AS v FROM edges
            UNION SELECT b AS u, a AS v FROM edges),
    reach(src, dst) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.src, s.v FROM reach r JOIN sym s ON s.u = r.dst
    )
    SELECT src AS id, MIN(dst) AS component
    FROM reach GROUP BY src ORDER BY id
"""

# COUNT(bench.g) counts non-null = matched shingle instances (bench is
# DISTINCT, so the left join is row-preserving and COUNT(*) = n_shingles)
ORACLE_SQL["doc_decontamination"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS (SELECT doc_id, list_aggregate(w[i:i+4], 'string_agg', ' ') AS g
           FROM t, unnest(range(1, len(w) - 3)) r(i) WHERE len(w) >= 5),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
    cor AS (SELECT * FROM sh WHERE doc_id >= 10)
    SELECT cor.doc_id,
           COUNT(bench.g) AS n_hits,
           COUNT(DISTINCT bench.g) AS n_distinct_hits,
           COUNT(*) AS n_shingles
    FROM cor LEFT JOIN bench USING (g)
    GROUP BY cor.doc_id HAVING COUNT(bench.g) > 0 ORDER BY doc_id
"""

ORACLE_SQL["word_graph_stats"] = """
    WITH e0 AS (
        SELECT DISTINCT w[i] AS a, w[i+1] AS b
        FROM (SELECT string_split(text, ' ') w FROM documents) t,
             unnest(range(1, len(w))) r(i)
        WHERE len(w) >= 2 AND w[i] <> w[i+1]
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    canon AS (SELECT DISTINCT LEAST(a, b) x, GREATEST(a, b) y FROM und),
    verts AS (SELECT x AS v FROM canon UNION SELECT y FROM canon)
    SELECT (SELECT COUNT(*) FROM verts) AS n_nodes,
           (SELECT COUNT(*) FROM canon) AS n_edges,
           (SELECT COUNT(*) FROM canon e1
            JOIN canon e2 ON e1.y = e2.x AND e1.x < e2.x
            JOIN canon e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles
"""

ORACLE_SQL["doc_length_quantiles"] = """
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.25), 4) AS p25,
           ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
           ROUND(quantile_cont(n_chars, 0.75), 4) AS p75,
           ROUND(quantile_cont(n_chars, 0.9), 4) AS p90
    FROM documents GROUP BY lang ORDER BY lang
"""

ORACLE_SQL["doc_train_split"] = """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val' ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs
    FROM documents GROUP BY split, lang ORDER BY split, lang
"""

# transitive closure via recursive CTE (UNION = set semantics →
# terminates at the reachability fixpoint); component = MIN(reachable id)
# matches the Spark side's min-label-propagation fixpoint
ORACLE_SQL["doc_semantic_dedup"] = """
    WITH RECURSIVE
    e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
          WHERE vec_id < 500),
    pairs AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb FROM e a, e b
        WHERE a.vec_id < b.vec_id
          AND ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.40
    ),
    sym AS (SELECT pa s, pb d FROM pairs UNION ALL SELECT pb, pa FROM pairs),
    reach(id, r) AS (
        SELECT s, s FROM sym
        UNION
        SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
    ),
    comp AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id)
    SELECT rep, COUNT(*) AS n_members FROM comp
    GROUP BY rep HAVING COUNT(*) > 1 ORDER BY rep
"""

ORACLE_SQL["doc_repetition_stats"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
    words AS (SELECT doc_id, len(w) AS n_words,
                     len(list_distinct(w)) AS n_distinct_words FROM t),
    bi AS (
        SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
        FROM t, unnest(range(1, len(w))) r(i)
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg),
    top AS (
        SELECT doc_id, bg AS top_bigram, c AS top_bigram_n,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, bg) AS rn,
               CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams
        FROM bc
    )
    SELECT w.doc_id, w.n_words, w.n_distinct_words,
           top.top_bigram, top.top_bigram_n, top.n_bigrams
    FROM words w JOIN top ON w.doc_id = top.doc_id AND top.rn = 1
    ORDER BY w.doc_id
"""

# the native-session_window variant verifies against the SAME oracle as
# the lag-based q_user_sessions — two independent implementations must
# agree with one ground truth
ORACLE_SQL["user_session_windows"] = ORACLE_SQL["user_sessions"]
ORACLE_SQL["events_stream_sessions"] = ORACLE_SQL["user_sessions"]

# splice the shared legal-text synthesis into the legal oracles ({{ }} in
# those templates escape literal regex braces for .format)
for _name in ("legal_citations", "legal_obligations", "legal_definitions",
              "legal_sections", "legal_parties", "legal_dates_amounts"):
    ORACLE_SQL[_name] = ORACLE_SQL[_name].format(legal_text=_LEGAL_TEXT_SQL)


SQL_QUERIES: Dict[str, Callable] = {
    "pricing_summary": q_pricing_summary,
    "top_customers": q_top_customers,
    "region_revenue": q_region_revenue,
    "order_priority_counts": q_order_priority_counts,
    "market_segment_stats": q_market_segment_stats,
    "events_latest_per_user": q_events_latest_per_user,
    "user_sessions": q_user_sessions,
    "user_session_windows": q_user_session_windows,
    "events_stream_sessions": q_events_stream_sessions,
    "events_type_stats": q_events_type_stats,
    "nations_without_suppliers": q_nations_without_suppliers,
    "part_type_counts": q_part_type_counts,
    "events_json_extract": q_events_json_extract,
    "orders_priority_rollup": q_orders_priority_rollup,
    "urgent_and_high_customers": q_urgent_and_high_customers,
    "doc_lang_counts": q_doc_lang_counts,
    "doc_token_stats": q_doc_token_stats,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_stopword_ratio": q_doc_stopword_ratio,
    "word_cooccurrence": q_word_cooccurrence,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_lang_id": q_doc_lang_id,
    "doc_quality": q_doc_quality,
    "doc_regex_tokens": q_doc_regex_tokens,
    "doc_winnow_fingerprint": q_doc_winnow_fingerprint,
    "orders_monthly_revenue": q_orders_monthly_revenue,
    "ship_delay_stats": q_ship_delay_stats,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "legal_citations": q_legal_citations,
    "legal_obligations": q_legal_obligations,
    "legal_definitions": q_legal_definitions,
    "legal_sections": q_legal_sections,
    "legal_parties": q_legal_parties,
    "legal_dates_amounts": q_legal_dates_amounts,
    "doc_classification": q_doc_classification,
    "doc_taxonomy_classification": q_doc_taxonomy_classification,
    "events_hourly_stream_counts": q_events_hourly_stream_counts,
    "cosine_topk": q_cosine_topk,
    "cosine_near_dup_pairs": q_cosine_near_dup_pairs,
    "knn_join": q_knn_join,
    "label_centroid_norms": q_label_centroid_norms,
    "doc_semantic_dedup": q_doc_semantic_dedup,
    "word_pagerank": q_word_pagerank,
    "doc_repetition_stats": q_doc_repetition_stats,
    "doc_decontamination": q_doc_decontamination,
    "doc_train_split": q_doc_train_split,
    "word_graph_stats": q_word_graph_stats,
    "doc_length_quantiles": q_doc_length_quantiles,
    "word_bfs_distances": q_word_bfs_distances,
    "doc_shingle_components": q_doc_shingle_components,
    "events_asof_purchase": q_events_asof_purchase,
    "events_range_join": q_events_range_join,
}


# --- round-3 additions: PII, link prediction, dup-span mass, salted agg,
# hopping windows -----------------------------------------------------------

_PII_DOCS_CTE = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0 THEN ''
                   ELSE ' u' || CAST(doc_id AS VARCHAR) || '@ex'
                        || CAST(doc_id % 7 AS VARCHAR) || '.com' END
           || CASE WHEN doc_id % 2 = 0
                   THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 4 < 2
                   THEN ' tel 555-'
                        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                        || '-'
                        || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS text
    FROM documents
"""

ORACLE_SQL["doc_pii_redaction"] = f"""
    WITH pii_docs AS ({_PII_DOCS_CTE}),
    red AS (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
                   '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g') AS redacted
        FROM pii_docs
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text,
               '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phone,
           md5(redacted) AS redacted_md5,
           CAST(length(redacted) AS BIGINT) AS redacted_len
    FROM red ORDER BY doc_id
"""

ORACLE_SQL["word_link_prediction"] = f"""
    WITH dedges AS ({_WORD_EDGES_CTE}),
    canon AS (SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y
              FROM dedges),
    und AS (SELECT x AS z, y AS n FROM canon
            UNION ALL SELECT y, x FROM canon),
    deg AS (SELECT z, COUNT(*) AS deg FROM und GROUP BY z),
    apex AS (SELECT und.z, und.n, deg.deg FROM und
             JOIN deg ON und.z = deg.z WHERE deg.deg <= 40),
    wedges AS (SELECT a.n AS x, b.n AS y, a.deg FROM apex a
               JOIN apex b ON a.z = b.z WHERE a.n < b.n),
    open_w AS (SELECT w.x, w.y, w.deg FROM wedges w
               ANTI JOIN canon c ON w.x = c.x AND w.y = c.y)
    SELECT x, y, COUNT(*) AS n_common,
           CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_score_units
    FROM open_w GROUP BY x, y
    ORDER BY ra_score_units DESC, x, y LIMIT 25
"""

ORACLE_SQL["doc_dup_span_mass"] = """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS g
           FROM docs, unnest(range(1, len(toks) - 6)) r(i)
           WHERE len(toks) >= 8),
    dfreq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY g)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(CASE WHEN dfreq.df >= 2 THEN 1 END) AS n_dup_shingles,
           (1000 * COUNT(CASE WHEN dfreq.df >= 2 THEN 1 END)) // COUNT(*)
             AS dup_permille
    FROM sh JOIN dfreq ON sh.g = dfreq.g
    GROUP BY sh.doc_id
    HAVING COUNT(CASE WHEN dfreq.df >= 2 THEN 1 END) > 0
    ORDER BY sh.doc_id
"""

ORACLE_SQL["doc_dup_span_removal"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    occ AS (SELECT doc_id, i AS pos, array_to_string(w[i:i+7], ' ') AS g
            FROM t, unnest(range(1, len(w) - 6)) r(i)),
    flg AS (SELECT doc_id, pos,
                   COUNT(*) OVER (PARTITION BY g) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY g
                                      ORDER BY doc_id, pos) AS rn
            FROM occ),
    rem AS (SELECT DISTINCT doc_id, pos + o AS rp
            FROM flg, unnest(range(0, 8)) r(o)
            WHERE cnt >= 2 AND rn > 1),
    nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM rem
             GROUP BY doc_id),
    tok AS (SELECT doc_id, i AS pos, w[i] AS tk
            FROM t, unnest(range(1, len(w) + 1)) r(i)),
    keep AS (SELECT k.doc_id,
                    string_agg(k.tk, ' ' ORDER BY k.pos) AS clean
             FROM tok k LEFT JOIN rem r
               ON r.doc_id = k.doc_id AND r.rp = k.pos
             WHERE r.rp IS NULL
             GROUP BY k.doc_id)
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(COALESCE(nrem.n_removed, 0) AS BIGINT) AS n_removed,
           md5(COALESCE(keep.clean, '')) AS clean_md5
    FROM t LEFT JOIN nrem USING (doc_id) LEFT JOIN keep USING (doc_id)
    ORDER BY t.doc_id
"""

ORACLE_SQL["brand_revenue_salted"] = """
    SELECT p_brand,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
"""

ORACLE_SQL["events_hopping_counts"] = """
    WITH offs AS (SELECT unnest([0, 1, 2, 3]) AS k)
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - k * INTERVAL '30 minutes' AS window_start,
           COUNT(*) AS n_events
    FROM events CROSS JOIN offs
    GROUP BY 1 ORDER BY 1
"""

SQL_QUERIES["doc_pii_redaction"] = q_doc_pii_redaction
SQL_QUERIES["word_link_prediction"] = q_word_link_prediction
SQL_QUERIES["doc_dup_span_mass"] = q_doc_dup_span_mass
SQL_QUERIES["doc_dup_span_removal"] = q_doc_dup_span_removal
SQL_QUERIES["brand_revenue_salted"] = q_brand_revenue_salted
SQL_QUERIES["events_hopping_counts"] = q_events_hopping_counts

ORACLE_SQL["doc_filter_funnel"] = f"""
    WITH pii_docs AS ({_PII_DOCS_CTE}),
    feats AS (
        SELECT d.doc_id, d.lang,
               len(string_split(d.text, ' ')) AS n_tok,
               len(list_distinct(string_split(d.text, ' '))) AS n_distinct,
               d.n_chars - (len(string_split(d.text, ' ')) - 1) AS chars_wo_sp,
               md5(substr(d.text, 1, 64)) AS h,
               len(regexp_extract_all(p.text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
               + len(regexp_extract_all(p.text,
                   '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'))
               + len(regexp_extract_all(p.text,
                   '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS n_pii
        FROM documents d JOIN pii_docs p ON d.doc_id = p.doc_id
    ),
    dup AS (SELECT h, MIN(doc_id) AS keeper, COUNT(*) AS c
            FROM feats GROUP BY h)
    SELECT CASE WHEN f.n_tok < 20 THEN 'too_short'
                WHEN f.chars_wo_sp < 3 * f.n_tok
                     OR f.chars_wo_sp > 10 * f.n_tok THEN 'bad_word_len'
                WHEN f.n_pii >= 3 THEN 'pii_heavy'
                WHEN d.c > 1 AND f.doc_id <> d.keeper THEN 'near_dup_prefix'
                WHEN 10 * f.n_distinct < 4 * f.n_tok THEN 'repetitive'
                ELSE 'keep' END AS verdict,
           f.lang, COUNT(*) AS n_docs
    FROM feats f JOIN dup d ON f.h = d.h
    GROUP BY 1, 2 ORDER BY 1, 2
"""
SQL_QUERIES["doc_filter_funnel"] = q_doc_filter_funnel


def q_doc_pack_bins(spark, sf_dir):
    """Concat-and-chunk sequence packing audit (packing.pack_bin_stats):
    per-language streams ordered by doc_id, 256-token bins; for each
    (lang, bin) the docs started there, their token mass, and the spill
    crossing the bin boundary. The cumsum window is PARTITIONED BY lang
    (the stream), so nothing ever orders globally — at 100 TB streams
    are (lang, shard) and each packs independently."""
    from ..operators.packing import pack_bin_stats
    d = _t(spark, sf_dir, "documents")
    return (pack_bin_stats(d, "lang", "doc_id",
                           F.size(F.split(F.col("text"), " ")),
                           capacity=256)
            .orderBy("lang", "bin_id"))


def q_lang_temperature_weights(spark, sf_dir):
    """alpha=0.5 multilingual temperature-sampling weights
    (packing.temperature_weights): integer ppm token shares, the
    floor-sqrt exponent (IEEE sqrt of an integer is exactly rounded on
    both engines), and an integer ppm renormalization — low-resource
    langs up-weighted, every output a BIGINT. ONE corpus scan; the two
    totals are windows over the tiny per-lang aggregate."""
    from ..operators.packing import temperature_weights
    d = _t(spark, sf_dir, "documents")
    return (temperature_weights(
        d, "lang", F.size(F.split(F.col("text"), " ")))
        .orderBy("lang"))


def q_events_funnel(spark, sf_dir):
    """Staged conversion funnel: per user the first 'view', the first
    'click' within 1 day AFTER that view, the first 'purchase' within
    1 day after that click; output (stage, n_users, total_conv_us).
    Each stage is an equi-join on user_id with a range residual plus a
    min-aggregation — partial-aggregable, no theta join, no window over
    a global order; conversion gaps are exact integer microseconds."""
    from ..operators.temporal import epoch_us
    ev = _t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 1 DAY")

    def first_after(prev, prev_ts, etype):
        nxt = (ev.filter(F.col("event_type") == etype)
               .select("user_id", F.col("ts").alias("_nxt_ts")))
        return (prev.join(nxt, "user_id")
                .filter((F.col("_nxt_ts") > F.col(prev_ts))
                        & (F.col("_nxt_ts") <= F.col(prev_ts) + day))
                .groupBy("user_id", prev_ts)
                .agg(F.min("_nxt_ts").alias(etype + "_ts")))

    # Each per-user stage frame feeds TWO consumers (the next stage's
    # join and its own stage() count); localCheckpoint pins the tiny
    # (≤ one row per user) result so the events scan behind it runs
    # once, not once per consumer.
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id").agg(F.min("ts").alias("view_ts"))
             .localCheckpoint(eager=False))
    clicks = first_after(views, "view_ts", "click").localCheckpoint(
        eager=False)
    purch = first_after(clicks.select("user_id", "click_ts"),
                        "click_ts", "purchase")

    def stage(df, name, a, b):
        gap = (F.lit(0).cast("long") if a is None
               else epoch_us(F.col(b)) - epoch_us(F.col(a)))
        return (df.agg(F.count("*").alias("n_users"),
                       F.sum(gap).alias("total_conv_us"))
                .select(F.lit(name).alias("stage"), "n_users",
                        "total_conv_us"))

    return (stage(views, "1_view", None, None)
            .unionByName(stage(clicks, "2_click", "view_ts", "click_ts"))
            .unionByName(stage(purch, "3_purchase", "click_ts",
                               "purchase_ts"))
            .orderBy("stage"))


ORACLE_SQL["doc_pack_bins"] = """
    WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tok,
               CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS start
        FROM toks
    )
    SELECT lang, CAST(start // 256 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens_started,
           CAST(SUM(GREATEST(start + n_tok - (start // 256 + 1) * 256, 0))
             AS BIGINT) AS n_spill_tokens
    FROM cum GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["lang_temperature_weights"] = """
    WITH per_lang AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM per_lang),
    sh AS (
        SELECT lang, n_docs, n_tokens,
               GREATEST(CAST(1000000::HUGEINT * n_tokens // total_tokens
                             AS BIGINT), 1) AS share_ppm
        FROM per_lang CROSS JOIN tot
    ),
    isq AS (
        SELECT lang, n_docs, n_tokens, share_ppm,
               CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT)
                 AS isqrt_share
        FROM sh
    ),
    stot AS (SELECT CAST(SUM(isqrt_share) AS BIGINT) AS s FROM isq)
    SELECT lang, n_docs, n_tokens, share_ppm, isqrt_share,
           CAST(1000000 * isqrt_share // s AS BIGINT) AS weight_ppm
    FROM isq CROSS JOIN stot ORDER BY lang
"""

ORACLE_SQL["events_funnel"] = """
    WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c1 AS (SELECT v.user_id, v.view_ts, MIN(e.ts) AS click_ts
           FROM v JOIN events e ON e.user_id = v.user_id
             AND e.event_type = 'click' AND e.ts > v.view_ts
             AND e.ts <= v.view_ts + INTERVAL 1 DAY
           GROUP BY v.user_id, v.view_ts),
    p AS (SELECT c1.user_id, c1.click_ts, MIN(e.ts) AS purchase_ts
          FROM c1 JOIN events e ON e.user_id = c1.user_id
            AND e.event_type = 'purchase' AND e.ts > c1.click_ts
            AND e.ts <= c1.click_ts + INTERVAL 1 DAY
          GROUP BY c1.user_id, c1.click_ts)
    SELECT '1_view' AS stage, COUNT(*) AS n_users,
           CAST(0 AS BIGINT) AS total_conv_us FROM v
    UNION ALL
    SELECT '2_click', COUNT(*),
           CAST(SUM(epoch_us(click_ts) - epoch_us(view_ts)) AS BIGINT)
    FROM c1
    UNION ALL
    SELECT '3_purchase', COUNT(*),
           CAST(SUM(epoch_us(purchase_ts) - epoch_us(click_ts)) AS BIGINT)
    FROM p
    ORDER BY stage
"""

SQL_QUERIES["doc_pack_bins"] = q_doc_pack_bins
SQL_QUERIES["lang_temperature_weights"] = q_lang_temperature_weights
SQL_QUERIES["events_funnel"] = q_events_funnel


def q_doc_stratified_sample(spark, sf_dir):
    """The sampler that makes the temperature weights actionable:
    per-language acceptance rates ∝ weight/share normalized so the
    most up-weighted language keeps everything, applied as a
    deterministic md5 5-hex-char threshold (packing.temperature_
    sample_rates + temperature_resample). Two corpus passes by design
    — pass 1 is the stats agg, pass 2 the shuffle-free filter; the
    rates ride a broadcast. Output: (lang, n_total, rate_ppm,
    n_kept)."""
    from ..operators.packing import (temperature_resample,
                                     temperature_sample_rates,
                                     temperature_weights)
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = temperature_weights(d, "lang", n_tok).localCheckpoint(eager=False)
    rates = temperature_sample_rates(w)
    kept = (temperature_resample(d, rates, "lang", "doc_id")
            .groupBy("lang").agg(F.count("*").alias("n_kept")))
    return (w.select("lang", F.col("n_docs").alias("n_total"))
            .join(rates, "lang")
            .join(kept, "lang", "left")
            .select("lang", "n_total", "rate_ppm",
                    F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
                    .alias("n_kept"))
            .orderBy("lang"))


ORACLE_SQL["doc_stratified_sample"] = """
    WITH per_lang AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM per_lang),
    sh AS (SELECT lang, n_docs,
                  GREATEST(CAST(1000000::HUGEINT * n_tokens // total_tokens
                                AS BIGINT), 1) AS share_ppm
           FROM per_lang CROSS JOIN tot),
    isq AS (SELECT lang, n_docs, share_ppm,
                   CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT)
                     AS isqrt_share
            FROM sh),
    stot AS (SELECT CAST(SUM(isqrt_share) AS BIGINT) AS s FROM isq),
    w AS (SELECT lang, n_docs, share_ppm,
                 CAST(1000000 * isqrt_share // s AS BIGINT) AS weight_ppm
          FROM isq CROSS JOIN stot),
    rr AS (SELECT lang, n_docs,
                  CAST(1000000000000::HUGEINT * weight_ppm // share_ppm
                       AS BIGINT) AS ratio_q
           FROM w),
    rmax AS (SELECT MAX(ratio_q) AS m FROM rr),
    rates AS (SELECT lang, n_docs,
                     CAST(1000000::HUGEINT * ratio_q // m AS BIGINT)
                       AS rate_ppm
              FROM rr CROSS JOIN rmax),
    kept AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)
              < CASE WHEN r.rate_ppm >= 1000000 THEN 'g'
                     ELSE lower(lpad(hex(r.rate_ppm * 1048576 // 1000000),
                                     5, '0')) END
        GROUP BY d.lang
    )
    SELECT rates.lang, rates.n_docs AS n_total, rates.rate_ppm,
           CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates LEFT JOIN kept ON rates.lang = kept.lang
    ORDER BY rates.lang
"""
SQL_QUERIES["doc_stratified_sample"] = q_doc_stratified_sample


_BPE_MERGES_CACHE: dict = {}


def _trained_bpe_merges(spark, sf_dir, n_merges=8):
    """Train (or recall) the BPE merge table for a corpus dir. The
    trained table is a tiny plain-Python list (one tuple per merge), so
    it memoizes per (sf_dir, n_merges) — q_bpe_merges and
    q_bpe_compression share ONE training pass per driver session
    instead of each paying the ~17-job iterative train (review finding,
    round 3). Safe across Spark sessions: the cache holds no Spark
    objects and the corpus dirs are immutable test data."""
    key = (sf_dir, n_merges)
    if key not in _BPE_MERGES_CACHE:
        from ..operators.bpe import bpe_merges, word_frequencies
        d = _t(spark, sf_dir, "documents")
        _BPE_MERGES_CACHE[key] = [
            (r.iter, r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_merges(spark, word_frequencies(d), n_merges)
            .orderBy("iter").collect()]
    return _BPE_MERGES_CACHE[key]


def q_bpe_merges(spark, sf_dir):
    """Tokenizer vocabulary construction: 8 BPE merge iterations over
    the corpus word-frequency table (operators/bpe.py — pinned merge
    contract: weighted pair counts, (count DESC, left, right) argmax,
    two literal left-to-right replace sweeps per merge). The corpus is
    scanned once; each iteration is a vocab-sized pair-count agg plus a
    1-row driver argmax. Value-verified against an 8x-unrolled SQL twin
    — the second iterative algorithm (after word_pagerank) with a FULL
    value hash."""
    rows = _trained_bpe_merges(spark, sf_dir, n_merges=8)
    return (spark.createDataFrame(
        rows, "iter long, left_sym string, right_sym string, "
              "pair_count long")
        .orderBy("iter"))


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled SQL twin of operators/bpe.bpe_merges: one pair-count +
    argmax + double-replace CTE trio per iteration, identical merge
    contract (DuckDB's replace is the same left-to-right non-overlap
    sweep as Spark's — verified incl. regex metachars and CJK)."""
    parts = [
        "WITH words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM"
        " (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t"
        " WHERE w <> '' GROUP BY w),",
        "s0 AS (SELECT ' ' || array_to_string(string_split(w, ''), ' ')"
        " || ' ' AS seq, freq FROM words),",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"p{i} AS (SELECT sym[i] AS a, sym[i+1] AS b,"
            f" CAST(SUM(freq) AS BIGINT) AS c FROM"
            f" (SELECT string_split(trim(seq), ' ') AS sym, freq"
            f" FROM s{i - 1}) t,"
            f" unnest(range(1, len(sym))) r(i) GROUP BY 1, 2),")
        parts.append(
            f"m{i} AS (SELECT a, b, c FROM p{i}"
            f" ORDER BY c DESC, a, b LIMIT 1),")
        if i < n_merges:
            parts.append(
                f"s{i} AS (SELECT replace(replace(s{i - 1}.seq,"
                f" ' ' || m{i}.a || ' ' || m{i}.b || ' ',"
                f" ' ' || m{i}.a || m{i}.b || ' '),"
                f" ' ' || m{i}.a || ' ' || m{i}.b || ' ',"
                f" ' ' || m{i}.a || m{i}.b || ' ') AS seq, freq"
                f" FROM s{i - 1} CROSS JOIN m{i}),")
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS iter, a AS left_sym,"
        f" b AS right_sym, c AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)]
    parts.append(" UNION ALL ".join(selects) + " ORDER BY iter")
    return "\n".join(parts)


ORACLE_SQL["bpe_merges"] = _bpe_oracle_sql(8)
SQL_QUERIES["bpe_merges"] = q_bpe_merges


def q_bpe_compression(spark, sf_dir):
    """Train-then-apply: the 8 learned merges encode the per-language
    vocabulary (bpe.encode_words — a vocab-sized projection, never
    per-occurrence work) and corpus frequencies weight the result into
    per-lang chars/tokens/compression-permille. The whole encode is
    driver-parameterized by the 8-row merge table (shared with
    q_bpe_merges via _trained_bpe_merges — trained once per session)."""
    from ..operators.bpe import encode_words
    d = _t(spark, sf_dir, "documents")
    merges = [(l, r) for _, l, r, _ in
              _trained_bpe_merges(spark, sf_dir, n_merges=8)]
    wl = (d.select("lang", F.explode(F.split(F.col("text"), " "))
                   .alias("word"))
          .filter(F.col("word") != "")
          .groupBy("lang", "word").agg(F.count("*").alias("freq")))
    enc = encode_words(wl, merges)
    return (enc.groupBy("lang").agg(
        F.sum("freq").alias("n_words"),
        F.sum(F.col("freq") * F.col("n_chars")).alias("n_chars"),
        F.sum(F.col("freq") * F.col("n_tokens")).alias("n_tokens"))
        .withColumn("compression_permille",
                    F.expr("1000 * n_tokens div n_chars"))
        .orderBy("lang"))


def _bpe_compression_oracle_sql(n_merges: int) -> str:
    """Extends the unrolled bpe_merges twin: after m1..mN, a per-(lang,
    word) vocabulary is encoded by the same chained double-replace CTEs
    and frequency-weighted into per-lang compression stats."""
    base = _bpe_oracle_sql(n_merges)
    prefix = base[:base.rindex("SELECT CAST(1 AS BIGINT)")]
    prefix = prefix.rstrip().rstrip(",") + ","
    parts = [
        prefix,
        "wl AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS freq FROM"
        " (SELECT lang, unnest(string_split(text, ' ')) AS w"
        " FROM documents) t WHERE w <> '' GROUP BY lang, w),",
        "e0 AS (SELECT lang, freq, CAST(len(w) AS BIGINT) AS n_chars,"
        " ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seq"
        " FROM wl),",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"e{i} AS (SELECT lang, freq, n_chars,"
            f" replace(replace(e{i - 1}.seq,"
            f" ' ' || m{i}.a || ' ' || m{i}.b || ' ',"
            f" ' ' || m{i}.a || m{i}.b || ' '),"
            f" ' ' || m{i}.a || ' ' || m{i}.b || ' ',"
            f" ' ' || m{i}.a || m{i}.b || ' ') AS seq"
            f" FROM e{i - 1} CROSS JOIN m{i}),")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_words,"
        f" CAST(SUM(freq * n_chars) AS BIGINT) AS n_chars,"
        f" CAST(SUM(freq * len(string_split(trim(seq), ' '))) AS BIGINT)"
        f" AS n_tokens,"
        f" CAST(1000 * SUM(freq * len(string_split(trim(seq), ' ')))"
        f" // SUM(freq * n_chars) AS BIGINT) AS compression_permille"
        f" FROM e{n_merges} GROUP BY lang ORDER BY lang")
    return "\n".join(parts)


ORACLE_SQL["bpe_compression"] = _bpe_compression_oracle_sql(8)
SQL_QUERIES["bpe_compression"] = q_bpe_compression


# --- round-3 sketch batch: HyperLogLog, count-min, bloom anti-join ---------
# (operators/sketches.py — probabilistic structures with PINNED integer
# md5 contracts, so DuckDB value-hash-verifies the sketches themselves)

def q_lang_distinct_hll(spark, sf_dir):
    """Per-language distinct-token count, exact AND HyperLogLog-sketched
    (m=256 registers over md5), plus the integer permille error between
    them. The sketch computation itself is value-verified: the oracle
    replays bucket/rho/register/estimator arithmetic bit-for-bit.

    Scale: exact COUNT(DISTINCT) shuffles every distinct token; the HLL
    register table is ≤256 rows per language regardless of corpus size,
    map-side combinable, and mergeable across shards/days by MAX — the
    at-scale replacement this query measures the cost of."""
    from ..operators.sketches import hll_distinct
    d = _t(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(F.split(F.col("text"), " "))
                     .alias("w"))
    est = hll_distinct(words, "lang", "w")
    exact = words.groupBy("lang").agg(
        F.count_distinct("w").alias("n_exact"))
    return (exact.join(F.broadcast(est), "lang")
            .withColumn("err_permille",
                        F.expr("(1000 * abs(n_hll - n_exact))"
                               " div n_exact"))
            .orderBy("lang"))


def _hll_words_oracle_sql() -> str:
    from ..operators.sketches import hll_oracle_sql
    inner = hll_oracle_sql(
        "SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents",
        "lang", "w")
    return f"""
    WITH words AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                   FROM documents),
    exact AS (SELECT lang, COUNT(DISTINCT w) AS n_exact
              FROM words GROUP BY lang),
    est AS (SELECT * FROM ({inner}) hll)
    SELECT exact.lang, n_exact, n_hll,
           CAST((1000 * abs(n_hll - n_exact)) // n_exact AS BIGINT)
             AS err_permille
    FROM exact JOIN est ON exact.lang = est.lang
    ORDER BY exact.lang
    """


ORACLE_SQL["lang_distinct_hll"] = _hll_words_oracle_sql()
SQL_QUERIES["lang_distinct_hll"] = q_lang_distinct_hll


def q_word_cms_topk(spark, sf_dir):
    """Count-min-sketch frequency estimates for the corpus's 25 most
    frequent tokens, next to their true counts and the sketch
    overcount. The d×w=4×4096 counter grid is a fixed-size map-side-
    combinable aggregate (16,384 rows at ANY corpus size; grids from
    disjoint shards merge by +) and broadcasts to the estimate join —
    the scale path for "how often does this token/n-gram appear in the
    100 TB corpus" without a full groupBy per probe set."""
    from ..operators.sketches import cms_counters, cms_estimate
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    counts = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    counters = cms_counters(counts, "w", "cnt")
    top = counts.orderBy(F.desc("cnt"), "w").limit(25)
    est = cms_estimate(top, counters, "w")
    return (top.join(F.broadcast(est), "w")
            .select(F.col("w").alias("word"),
                    F.col("cnt").alias("true_cnt"),
                    "cms_est",
                    (F.col("cms_est") - F.col("cnt")).alias("overcount"))
            .orderBy(F.desc("true_cnt"), "word"))


def _cms_oracle_sql() -> str:
    from ..operators.sketches import cms_bucket_sql
    bucket = cms_bucket_sql("j", "w")
    return f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents),
    counts AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
    ex AS (SELECT w, cnt, j, {bucket} AS bucket
           FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
    counters AS (SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS c
                 FROM ex GROUP BY j, bucket),
    top AS (SELECT w, cnt FROM counts ORDER BY cnt DESC, w LIMIT 25),
    est AS (SELECT ex.w AS w, MIN(c) AS cms_est
            FROM ex JOIN top ON ex.w = top.w
            JOIN counters ON ex.j = counters.j
                         AND ex.bucket = counters.bucket
            GROUP BY ex.w)
    SELECT top.w AS word, top.cnt AS true_cnt, est.cms_est,
           est.cms_est - top.cnt AS overcount
    FROM top JOIN est ON top.w = est.w
    ORDER BY true_cnt DESC, word
    """


ORACLE_SQL["word_cms_topk"] = _cms_oracle_sql()
SQL_QUERIES["word_cms_topk"] = q_word_cms_topk


def q_doc_blocklist_bloom(spark, sf_dir):
    """Bloom-filter blocklist filtering, the broadcast-bitmap way: docs
    whose doc_id % 37 == 0 form a content-digest blocklist; every doc
    is probed against an 8 KiB bitmap (k=4, m=65536) as a pure JVM
    bit-test literal — the probe side never shuffles and never joins —
    then bloom-POSITIVES get the exact broadcast verification join.
    Reports per-lang probe/bloom/true/false-positive counts; zero false
    negatives is a bloom-filter invariant the oracle comparison (naive
    semi-join semantics, no bitmap) re-proves on every run."""
    from ..operators.sketches import bloom_bitmap, bloom_membership_col
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    digests = d.select("doc_id", "lang",
                       F.md5(F.col("text").cast("string")).alias("dg"))
    block = (digests.filter(F.col("doc_id") % 37 == 0)
             .select("dg").distinct())
    words = bloom_bitmap(block, "dg")
    probe = (digests
             .withColumn("bloom_pos",
                         bloom_membership_col(F.col("dg"), words))
             .join(F.broadcast(block.withColumn("blk", F.lit(True))),
                   "dg", "left")
             .withColumn("blk", F.coalesce("blk", F.lit(False))))
    return (probe.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("bloom_pos").cast("long")).alias("n_bloom_pos"),
        F.sum(F.col("blk").cast("long")).alias("n_true_blocked"),
        F.sum((F.col("bloom_pos") & ~F.col("blk")).cast("long"))
         .alias("n_false_pos"))
        .orderBy("lang"))


def _bloom_oracle_sql() -> str:
    from ..operators.sketches import bloom_bucket_sql
    bucket = bloom_bucket_sql("i", "dg")
    return f"""
    WITH digests AS (SELECT doc_id, lang, md5(text) AS dg
                     FROM documents WHERE text IS NOT NULL),
    block AS (SELECT DISTINCT dg FROM digests WHERE doc_id % 37 = 0),
    bbuckets AS (SELECT DISTINCT {bucket} AS bucket
                 FROM block CROSS JOIN
                      (SELECT unnest([0, 1, 2, 3]) AS i) ii),
    probe AS (SELECT doc_id, {bucket} AS bucket
              FROM digests CROSS JOIN
                   (SELECT unnest([0, 1, 2, 3]) AS i) ii),
    hits AS (SELECT doc_id,
                    SUM(CASE WHEN bucket IN (SELECT bucket FROM bbuckets)
                        THEN 1 ELSE 0 END) AS nb
             FROM probe GROUP BY doc_id),
    flag AS (SELECT d.lang,
                    (h.nb = 4) AS bloom_pos,
                    d.dg IN (SELECT dg FROM block) AS blk
             FROM digests d JOIN hits h ON d.doc_id = h.doc_id)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pos,
           CAST(SUM(CASE WHEN blk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_blocked,
           CAST(SUM(CASE WHEN bloom_pos AND NOT blk THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flag GROUP BY lang ORDER BY lang
    """


ORACLE_SQL["doc_blocklist_bloom"] = _bloom_oracle_sql()
SQL_QUERIES["doc_blocklist_bloom"] = q_doc_blocklist_bloom


# --- round-3 retrieval batch: BM25 lexical ranking + RRF hybrid fusion ----
# (operators/retrieval.py — the keyword half of the reference's hybrid RAG
# read path, integer-exact so the ranker itself is value-hash-verified)

_BM25_TERMS = ["join", "vector", "stream", "spark"]


def q_doc_bm25_topk(spark, sf_dir):
    """Top-15 documents by exact-integer BM25 for a fixed 4-term query.
    tf/df/len are map-side-combinable aggs, the df/idf table broadcasts
    (≤4 rows), corpus totals are ONE 1-row broadcast aggregate, and the
    top-k is TakeOrderedAndProject — nothing shuffles on more than
    doc_id. Scores are BIGINT micro-units: bit-identical across engines
    (see retrieval.bm25_scores for the pinned arithmetic)."""
    from ..operators.retrieval import bm25_scores
    d = _t(spark, sf_dir, "documents")
    top = (bm25_scores(d, "doc_id", "text", _BM25_TERMS)
           .orderBy(F.desc("bm25_micro"), "doc_id").limit(15))
    w = Window.orderBy(F.desc("bm25_micro"), "doc_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "bm25_micro"))


def _bm25_topk_oracle_sql() -> str:
    from ..operators.retrieval import bm25_oracle_sql
    ctes = bm25_oracle_sql("documents", "doc_id", "text", _BM25_TERMS)
    return f"""
    WITH {ctes}
    SELECT ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS rank,
           doc_id, bm25_micro
    FROM bm25 ORDER BY bm25_micro DESC, doc_id LIMIT 15
    """


ORACLE_SQL["doc_bm25_topk"] = _bm25_topk_oracle_sql()
SQL_QUERIES["doc_bm25_topk"] = q_doc_bm25_topk


def q_doc_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    top-50 and the cosine vector top-50 (vs the vec_id=0 query vector,
    the engine's standing query convention) — the production shape of
    the reference's invoke_question hybrid (graph/vector) read path.
    rrf_ppm = Σ 1e6 div (60 + rank) is pure integer, so the fused
    ranking value-hash-verifies; the vector side outputs ranks over
    4-dp-rounded scores (the cross-engine float stability contract
    every cosine query in this engine uses)."""
    from ..operators.retrieval import bm25_scores, rrf_fuse
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")

    lex = (bm25_scores(d, "doc_id", "text", _BM25_TERMS)
           .orderBy(F.desc("bm25_micro"), "doc_id").limit(50))
    wl = Window.orderBy(F.desc("bm25_micro"), "doc_id")
    lex = lex.withColumn("rank", F.row_number().over(wl))

    qvec = e.filter(F.col("vec_id") == 0).first().embedding
    vec = similarity.brute_force_topk(
        e.filter(F.col("vec_id") != 0), qvec, k=50)
    wv = Window.orderBy(F.desc("score"), "vec_id")
    vec = (vec.withColumn("rank", F.row_number().over(wv))
           .withColumnRenamed("vec_id", "doc_id"))

    fused = rrf_fuse(lex.select("doc_id", "rank"),
                     vec.select("doc_id", "rank"), "doc_id")
    return fused.orderBy(F.desc("rrf_ppm"), "doc_id").limit(15)


def _hybrid_rrf_oracle_sql() -> str:
    from ..operators.retrieval import RRF_K, bm25_oracle_sql
    ctes = bm25_oracle_sql("documents", "doc_id", "text", _BM25_TERMS)
    return f"""
    WITH {ctes},
    lex AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                     AS rank
            FROM bm25 ORDER BY bm25_micro DESC, doc_id LIMIT 50),
    q AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = 0),
    vscored AS (SELECT vec_id AS doc_id,
                       ROUND(list_cosine_similarity(embedding::DOUBLE[],
                                                    q.v), 4) AS score
                FROM embeddings, q WHERE vec_id <> 0),
    vec AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
            FROM vscored ORDER BY score DESC, doc_id LIMIT 50),
    fused AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
                     CAST(COALESCE(1000000 // ({RRF_K} + lex.rank), 0)
                          + COALESCE(1000000 // ({RRF_K} + vec.rank), 0)
                          AS BIGINT) AS rrf_ppm
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
    SELECT doc_id, rrf_ppm FROM fused
    ORDER BY rrf_ppm DESC, doc_id LIMIT 15
    """


ORACLE_SQL["doc_hybrid_rrf"] = _hybrid_rrf_oracle_sql()
SQL_QUERIES["doc_hybrid_rrf"] = q_doc_hybrid_rrf


# --- round-3 exposure batch: library ops promoted to oracled queries -------
# (urlnorm / surprisal / quantize — previously pytest-only; EXPLAIN.md
# flagged them for driver exposure as budget freed up)

def _fabricated_urls(d):
    """Deterministic crawl-alias URL per doc_id, exercising every
    canonicalization feature: scheme case/default-port interplay, host
    casing, userinfo, trailing slash, tracker params, unsorted query
    keys, fragments. The SQL twin builds the identical strings."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, "https").otherwise("http")
    host = (F.when(did % 3 == 0, "Example.COM")
            .when(did % 3 == 1, "example.com")
            .otherwise("user:pw@EXAMPLE.com"))
    port = (F.when(did % 4 == 0, ":80")
            .when(did % 4 == 1, ":443").otherwise(""))
    path = F.concat(F.lit("/a/"), (did % 7).cast("string"),
                    F.when(did % 5 == 0, "/").otherwise(""))
    query = F.when(did % 2 == 0, "?b=2&utm_source=x&a=1") \
             .otherwise("?b=2&a=1")
    frag = F.when(did % 3 == 0, "#frag").otherwise("")
    return d.select(F.concat(scheme, F.lit("://"), host, port, path,
                             query, frag).alias("url"))


_FABRICATED_URLS_CTE = """
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
           || '://'
           || CASE WHEN doc_id % 3 = 0 THEN 'Example.COM'
                   WHEN doc_id % 3 = 1 THEN 'example.com'
                   ELSE 'user:pw@EXAMPLE.com' END
           || CASE WHEN doc_id % 4 = 0 THEN ':80'
                   WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END
           || '/a/' || CAST(doc_id % 7 AS VARCHAR)
           || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
           || CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=x&a=1'
                   ELSE '?b=2&a=1' END
           || CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END AS url
    FROM documents
"""


def q_url_dup_stats(spark, sf_dir):
    """Crawl-frontier alias mass: canonicalize one deterministic alias
    URL per document (RFC 3986 §6 normalization + tracker strip + query
    sort, ONE pure regexp/array projection — operators/urlnorm.py) and
    report every canonical target fetched under >1 raw spelling. The
    canonicalizer itself is what's value-verified: the oracle replays
    each normalization step in SQL and the hashes must agree on every
    byte of every canonical URL."""
    from ..operators.urlnorm import url_dup_stats
    urls = _fabricated_urls(_t(spark, sf_dir, "documents"))
    return url_dup_stats(urls, "url").orderBy("canonical_url")


def _url_dup_stats_oracle_sql() -> str:
    from ..operators.urlnorm import canonical_url_sql
    ctes = canonical_url_sql(_FABRICATED_URLS_CTE)
    return f"""
    WITH {ctes}
    SELECT canonical_url,
           COUNT(*) AS n_fetches,
           COUNT(DISTINCT url) AS n_distinct_spellings
    FROM canon GROUP BY canonical_url
    HAVING COUNT(DISTINCT url) > 1
    ORDER BY canonical_url
    """


ORACLE_SQL["url_dup_stats"] = _url_dup_stats_oracle_sql()
SQL_QUERIES["url_dup_stats"] = q_url_dup_stats


def q_doc_surprisal_topk(spark, sf_dir):
    """CCNet-style unigram-surprisal quality score (integer-exact bits
    via the portable floor-log2), top-25 most surprising docs — the
    candidates a perplexity filter would flag. All-BIGINT output."""
    from ..operators.surprisal import doc_surprisal
    d = _t(spark, sf_dir, "documents")
    return (doc_surprisal(d, "doc_id", "text")
            .orderBy(F.desc("mean_millibits"), "id").limit(25))


ORACLE_SQL["doc_surprisal_topk"] = """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents),
    toks_nz AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    vocab AS (SELECT word, COUNT(*) AS c FROM toks_nz GROUP BY word),
    vocab_t AS (SELECT word, c,
                       CAST(SUM(c) OVER () AS BIGINT) AS total_tokens
                FROM vocab),
    surp AS (SELECT word,
                    (length(bin(total_tokens)) - 1) - (length(bin(c)) - 1)
                      AS surprisal_bits
             FROM vocab_t)
    SELECT doc_id AS id,
           COUNT(*) AS n_tokens,
           CAST(SUM(surprisal_bits) AS BIGINT) AS surprisal_units,
           CAST((1000 * SUM(surprisal_bits)) // COUNT(*) AS BIGINT)
             AS mean_millibits
    FROM toks_nz JOIN surp USING (word)
    GROUP BY doc_id
    ORDER BY mean_millibits DESC, id LIMIT 25
"""
SQL_QUERIES["doc_surprisal_topk"] = q_doc_surprisal_topk


def q_doc_backoff_lm(spark, sf_dir):
    """Bigram Stupid Backoff LM scoring (surprisal.stupid_backoff_bits,
    Brants et al. 2007): even doc_ids train the counts, odd doc_ids are
    scored — held-out bigrams exercise the backoff and OOV branches.
    All-BIGINT output; every scored doc returned, ordered by id."""
    from ..operators.surprisal import stupid_backoff_bits
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    score = d.filter(F.col("doc_id") % 2 == 1)
    return (stupid_backoff_bits(train, score, "doc_id", "text")
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))


ORACLE_SQL["doc_backoff_lm"] = """
    WITH tr AS (SELECT doc_id,
                       list_filter(string_split(text, ' '),
                                   x -> x <> '') AS w
                FROM documents WHERE doc_id % 2 = 0),
    sc AS (SELECT doc_id,
                  list_filter(string_split(text, ' '),
                              x -> x <> '') AS w
           FROM documents WHERE doc_id % 2 = 1),
    uni AS (SELECT word, COUNT(*) AS c
            FROM (SELECT unnest(w) AS word FROM tr) t
            GROUP BY word),
    tot AS (SELECT CAST(greatest(COALESCE(SUM(c), 0), 1) AS BIGINT) AS n
            FROM uni),
    bi AS (SELECT a, b, COUNT(*) AS c_ab
           FROM (SELECT w[i] AS a, w[i+1] AS b
                 FROM tr, unnest(range(1, len(w))) r(i)) t
           GROUP BY a, b),
    ev AS (SELECT doc_id, w[i] AS a, w[i+1] AS b
           FROM sc, unnest(range(1, len(w))) r(i)),
    bits AS (SELECT ev.doc_id,
                    bi.c_ab IS NULL AND ub.c IS NOT NULL AS backoff,
                    ub.c IS NULL AS oov,
                    CASE
                      WHEN bi.c_ab IS NOT NULL
                        THEN (length(bin(ua.c)) - 1)
                             - (length(bin(bi.c_ab)) - 1)
                      WHEN ub.c IS NOT NULL
                        THEN 1 + (length(bin(tot.n)) - 1)
                             - (length(bin(ub.c)) - 1)
                      ELSE 1 + (length(bin(tot.n)) - 1) + 1
                    END AS bits
             FROM ev
             LEFT JOIN bi ON ev.a = bi.a AND ev.b = bi.b
             LEFT JOIN uni ua ON ev.a = ua.word
             LEFT JOIN uni ub ON ev.b = ub.word
             CROSS JOIN tot)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_backoff,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(bits) AS BIGINT) AS bits_units,
           CAST((1000 * SUM(bits)) // COUNT(*) AS BIGINT)
             AS mean_millibits
    FROM bits GROUP BY doc_id ORDER BY doc_id
"""
SQL_QUERIES["doc_backoff_lm"] = q_doc_backoff_lm


def q_doc_backoff_lm_broadcast(spark, sf_dir):
    """Round-5 Zipf-head-broadcast twin of doc_backoff_lm
    (surprisal.stupid_backoff_bits_head_broadcast): the top-K unigram/
    bigram count heads resolve scoring events through a broadcast join
    (no shuffle for head hits); only head misses join the count tails.
    head_k=64 on this corpus leaves a real tail, so BOTH the broadcast
    hit path and the tail miss path execute — and the DuckDB oracle is
    the SAME SQL as doc_backoff_lm: the execution strategy changes, the
    answer must not."""
    from ..operators.surprisal import stupid_backoff_bits_head_broadcast
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    score = d.filter(F.col("doc_id") % 2 == 1)
    return (stupid_backoff_bits_head_broadcast(train, score, "doc_id",
                                               "text", head_k=64)
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id"))


ORACLE_SQL["doc_backoff_lm_broadcast"] = ORACLE_SQL["doc_backoff_lm"]
SQL_QUERIES["doc_backoff_lm_broadcast"] = q_doc_backoff_lm_broadcast


def q_cosine_topk_sq8(spark, sf_dir):
    """SQ8-quantized cosine top-10 vs the vec_id=0 query vector: the
    int8 table is 4x smaller to scan and the dot products run in exact
    integer arithmetic (only the final normalization touches floats,
    4-dp rounded). The full quantize→integer-dot→rank path is what the
    oracle replays — a value-hash check on the quantization contract
    itself."""
    from ..operators.quantize import quantize_embeddings, \
        quantized_cosine_topk
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).first().embedding
    qz = quantize_embeddings(e.filter(F.col("vec_id") != 0))
    return quantized_cosine_topk(qz, qvec, k=10)


ORACLE_SQL["cosine_topk_sq8"] = """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
                  FROM embeddings),
    qsrc AS (SELECT v,
                    COALESCE(NULLIF(list_max(list_transform(v,
                        x -> abs(x))), 0), 1.0) AS mx
             FROM base WHERE vec_id = 0),
    qvec AS (SELECT list_transform(v, x -> CAST(round(x * 127.0 / mx)
                                               AS INTEGER)) AS qq
             FROM qsrc),
    rows_q AS (SELECT vec_id,
                      list_max(list_transform(v, x -> abs(x))) AS scale,
                      v
               FROM base WHERE vec_id <> 0),
    quant AS (SELECT vec_id,
                     CASE WHEN scale = 0
                          THEN list_transform(v, x -> CAST(0 AS INTEGER))
                          ELSE list_transform(v, x -> CAST(round(
                               x * 127.0 / scale) AS INTEGER)) END AS q
              FROM rows_q),
    scored AS (SELECT vec_id,
                      list_dot_product(q, qq) AS dot,
                      sqrt(list_dot_product(q, q)) AS rnorm,
                      sqrt(list_dot_product(qq, qq)) AS qnorm
               FROM quant CROSS JOIN qvec),
    ranked AS (SELECT vec_id,
                      ROUND(dot / (rnorm * CASE WHEN qnorm = 0 THEN 1.0
                                                ELSE qnorm END), 4)
                        AS score
               FROM scored WHERE rnorm > 0)
    SELECT vec_id, score FROM ranked
    ORDER BY score DESC, vec_id LIMIT 10
"""
SQL_QUERIES["cosine_topk_sq8"] = q_cosine_topk_sq8


def q_domain_cap_rollup(spark, sf_dir):
    """Per-domain corpus governance in one report: doc counts, the
    md5-ranked quota sample (≤15 docs/domain — urlnorm.domain_cap_sample,
    the C4/RefinedWeb per-host cap), integer mean doc length, and the
    domain keep/drop verdict a quality-floor policy would emit. Two
    map-side-combinable aggs + one ≤#domains broadcast join; the only
    corpus-shaped shuffle is the per-domain window."""
    from ..operators.urlnorm import domain_cap_sample
    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "n_chars",
        F.concat(F.lit("site"), (F.col("doc_id") % 23).cast("string"),
                 F.lit(".example")).alias("domain"))
    kept = (domain_cap_sample(docs, "domain", 15, "doc_id")
            .groupBy("domain").agg(F.count("*").alias("n_kept")))
    stats = (docs.groupBy("domain")
             .agg(F.count("*").alias("n_docs"),
                  F.expr("sum(n_chars) div count(*)").alias("mean_chars")))
    return (stats.join(F.broadcast(kept), "domain")
            .withColumn("verdict",
                        F.when(F.col("mean_chars") < 290, "drop")
                         .otherwise("keep"))
            .orderBy("domain"))


ORACLE_SQL["domain_cap_rollup"] = """
    WITH docs AS (SELECT doc_id, n_chars,
                         'site' || CAST(doc_id % 23 AS VARCHAR)
                         || '.example' AS domain
                  FROM documents),
    ranked AS (SELECT domain,
                      ROW_NUMBER() OVER (
                          PARTITION BY domain
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                        AS rn
               FROM docs),
    kept AS (SELECT domain, COUNT(*) AS n_kept FROM ranked
             WHERE rn <= 15 GROUP BY domain),
    stats AS (SELECT domain, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
              FROM docs GROUP BY domain)
    SELECT stats.domain, n_docs, mean_chars, n_kept,
           CASE WHEN mean_chars < 290 THEN 'drop' ELSE 'keep' END
             AS verdict
    FROM stats JOIN kept ON stats.domain = kept.domain
    ORDER BY stats.domain
"""
SQL_QUERIES["domain_cap_rollup"] = q_domain_cap_rollup


def q_quality_threshold_sweep(spark, sf_dir):
    """Threshold calibration for a length-floor quality filter: keep
    rates per (threshold, lang) for four candidate floors in ONE corpus
    scan — explode the 4-element threshold array (a 4x fan-out of a
    2-column projection, not of the corpus text) and aggregate. The
    report a pipeline operator reads before pinning a filter constant."""
    d = _t(spark, sf_dir, "documents")
    th = F.explode(F.array(*[F.lit(t) for t in (200, 290, 350, 420)]))
    return (d.select("lang", "n_chars", th.alias("threshold"))
            .groupBy("threshold", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("n_chars") >= F.col("threshold"))
                       .cast("long")).alias("n_keep"))
            .withColumn("keep_permille",
                        F.expr("(1000 * n_keep) div n_docs"))
            .orderBy("threshold", "lang"))


ORACLE_SQL["quality_threshold_sweep"] = """
    SELECT threshold, lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_chars >= threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           CAST((1000 * SUM(CASE WHEN n_chars >= threshold
                            THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
             AS keep_permille
    FROM documents
    CROSS JOIN (SELECT unnest([200, 290, 350, 420]) AS threshold) t
    GROUP BY threshold, lang ORDER BY threshold, lang
"""
SQL_QUERIES["quality_threshold_sweep"] = q_quality_threshold_sweep


def q_dup_cluster_histogram(spark, sf_dir):
    """Exact-duplicate cluster-size histogram: how duplicate mass is
    distributed (cluster_size → #clusters, #docs, permille of corpus) —
    the report that decides whether dedup is worth a pass and which
    collapse strategy to use. Two pipelined map-side-combinable aggs
    (digest → size, size → histogram) + corpus total via one 1-row
    broadcast aggregate; the corpus shuffles once, on the digest.
    The sf corpus is dup-free, so deterministic duplicate mass is
    injected (2nd copies of doc_id%7==0, 3rd copies of %49==0) to make
    the histogram non-trivial — sizes 1/2/3 all present at sf0.01."""
    base = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull()))
    d = (base.select("text")
         .unionAll(base.filter(F.col("doc_id") % 7 == 0).select("text"))
         .unionAll(base.filter(F.col("doc_id") % 49 == 0).select("text")))
    sizes = (d.select(F.md5(F.col("text").cast("string")).alias("dg"))
             .groupBy("dg").agg(F.count("*").alias("cluster_size")))
    total = d.select(F.count("*").alias("n_total"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters"),
                 F.sum("cluster_size").alias("n_docs"))
            .crossJoin(F.broadcast(total))
            .withColumn("mass_permille",
                        F.expr("(1000 * n_docs) div n_total"))
            .drop("n_total")
            .orderBy("cluster_size"))


ORACLE_SQL["dup_cluster_histogram"] = """
    WITH corpus AS (
        SELECT text FROM documents WHERE text IS NOT NULL
        UNION ALL SELECT text FROM documents
                  WHERE text IS NOT NULL AND doc_id % 7 = 0
        UNION ALL SELECT text FROM documents
                  WHERE text IS NOT NULL AND doc_id % 49 = 0),
    sizes AS (SELECT md5(text) AS dg, COUNT(*) AS cluster_size
              FROM corpus GROUP BY dg),
    total AS (SELECT COUNT(*) AS n_total FROM corpus)
    SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
           CAST((1000 * SUM(cluster_size)) // n_total AS BIGINT)
             AS mass_permille
    FROM sizes CROSS JOIN total
    GROUP BY cluster_size, n_total ORDER BY cluster_size
"""
SQL_QUERIES["dup_cluster_histogram"] = q_dup_cluster_histogram


def q_doc_paragraph_dedup(spark, sf_dir):
    """CCNet-stage paragraph dedup (dedup.paragraph_dedup): first-witness
    keeps per exact paragraph corpus-wide, each doc reconstructed from
    its kept paragraphs and digested. The sf corpus is an unpunctuated
    word stream, so paragraph structure is fabricated deterministically
    on BOTH engines: every doc's own lead-10-token paragraph, a shared
    boilerplate paragraph on doc_id%3==0 (one global dup cluster), and
    the decade-leader's lead-10 paragraph on doc_id%2==0 (50 clusters
    of ~5). The md5 of every reconstructed doc must match — a byte-level
    check on kept-set AND reconstruction order."""
    from ..operators.dedup import paragraph_dedup
    d = _t(spark, sf_dir, "documents")
    lead = d.select("doc_id",
                    F.concat_ws(" ", F.slice(F.split(F.col("text"), " "),
                                             1, 10)).alias("l10"))
    leaders = lead.select(F.col("doc_id").alias("lid"),
                          F.col("l10").alias("lead_l10"))
    fab = (lead.join(F.broadcast(leaders),
                     (F.col("doc_id") - F.col("doc_id") % 10)
                     == F.col("lid"))
           .select("doc_id",
                   F.concat(
                       F.col("l10"),
                       F.when(F.col("doc_id") % 3 == 0,
                              ". boilerplate footer subscribe now")
                       .otherwise(""),
                       F.when(F.col("doc_id") % 2 == 0,
                              F.concat(F.lit(". "), F.col("lead_l10")))
                       .otherwise("")).alias("text")))
    return paragraph_dedup(fab, "doc_id", "text").orderBy("id")


ORACLE_SQL["doc_paragraph_dedup"] = """
    WITH lead AS (SELECT doc_id,
                         array_to_string(string_split(text, ' ')[1:10], ' ')
                           AS l10
                  FROM documents),
    fab AS (SELECT a.doc_id AS id,
                   a.l10
                   || CASE WHEN a.doc_id % 3 = 0
                           THEN '. boilerplate footer subscribe now'
                           ELSE '' END
                   || CASE WHEN a.doc_id % 2 = 0 THEN '. ' || b.l10
                           ELSE '' END AS text
            FROM lead a JOIN lead b
              ON b.doc_id = a.doc_id - (a.doc_id % 10)),
    paras AS (SELECT id, i AS pos, ps[i] AS para
              FROM (SELECT id, string_split(text, '. ') AS ps FROM fab) t,
                   unnest(range(1, len(ps) + 1)) r(i)
              WHERE ps[i] <> ''),
    flagged AS (SELECT id, pos, para,
                       ROW_NUMBER() OVER (PARTITION BY md5(para)
                                          ORDER BY id, pos) = 1 AS kept
                FROM paras)
    SELECT id, COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(para, '. ' ORDER BY pos)
                        FILTER (WHERE kept), '')) AS kept_md5
    FROM flagged GROUP BY id ORDER BY id
"""
SQL_QUERIES["doc_paragraph_dedup"] = q_doc_paragraph_dedup


def q_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth over word 3-GRAM types (the unit an
    n-gram LM / tokenizer capacity plan sizes; the unigram vocab of the
    sf corpus saturates at 31 words, useless as a curve): distinct
    3-gram types seen within the first k documents, for five
    checkpoints, WITHOUT rescanning per checkpoint — vocab(k) =
    #{grams whose FIRST witness doc_id < k}, so ONE (gram →
    min(doc_id)) aggregate feeds all checkpoints via a 5-way explode of
    the vocab-sized frame (never the corpus)."""
    from ..operators.dedup import _word_shingles
    d = _t(spark, sf_dir, "documents")
    first = (_word_shingles(d, 3, "doc_id", "text")
             .groupBy("g").agg(F.min("id").alias("first_doc")))
    cp = F.explode(F.array(*[F.lit(c) for c in
                             (100, 200, 300, 400, 500)]))
    return (first.select("first_doc", cp.alias("checkpoint"))
            .groupBy("checkpoint")
            .agg(F.sum((F.col("first_doc") < F.col("checkpoint"))
                       .cast("long")).alias("vocab_size"))
            .orderBy("checkpoint"))


ORACLE_SQL["vocab_growth"] = """
    WITH grams AS (SELECT doc_id,
                          array_to_string(toks[i:i+2], ' ') AS g
                   FROM (SELECT doc_id, string_split(text, ' ') AS toks
                         FROM documents) t,
                        unnest(range(1, len(toks) - 1)) r(i)
                   WHERE len(toks) >= 3),
    first AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
    SELECT checkpoint,
           CAST(SUM(CASE WHEN first_doc < checkpoint THEN 1 ELSE 0 END)
                AS BIGINT) AS vocab_size
    FROM first CROSS JOIN
         (SELECT unnest([100, 200, 300, 400, 500]) AS checkpoint) c
    GROUP BY checkpoint ORDER BY checkpoint
"""
SQL_QUERIES["vocab_growth"] = q_vocab_growth


def q_zipf_band_histogram(spark, sf_dir):
    """Zipf frequency-band histogram: vocabulary binned by
    floor(log2(count)) — how token mass splits between the head (the
    bands a broadcast vocab covers) and the tail (the default-count-1
    regime the surprisal scorer exploits), over word BIGRAM types (the
    unigram vocab of the sf corpus is 31 words — two bands, no curve).
    One vocab-sized agg over the gram stream; the band arithmetic is
    the portable floor-log2."""
    from ..operators.dedup import _word_shingles
    from ..operators.surprisal import _flog2
    d = _t(spark, sf_dir, "documents")
    vocab = (_word_shingles(d, 2, "doc_id", "text")
             .groupBy("g").agg(F.count("*").alias("c")))
    return (vocab.withColumn("band", _flog2(F.col("c")))
            .groupBy("band")
            .agg(F.count("*").alias("n_words"),
                 F.sum("c").alias("token_mass"))
            .orderBy("band"))


ORACLE_SQL["zipf_band_histogram"] = """
    WITH grams AS (SELECT array_to_string(toks[i:i+1], ' ') AS g
                   FROM (SELECT string_split(text, ' ') AS toks
                         FROM documents) t,
                        unnest(range(1, len(toks))) r(i)
                   WHERE len(toks) >= 2),
    vocab AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g)
    SELECT (length(bin(c)) - 1) AS band,
           COUNT(*) AS n_words,
           CAST(SUM(c) AS BIGINT) AS token_mass
    FROM vocab GROUP BY band ORDER BY band
"""
SQL_QUERIES["zipf_band_histogram"] = q_zipf_band_histogram


def _bigram_edges(d):
    """Adjacent-BIGRAM graph (nodes = word bigrams, edges = 3-gram
    support) — sparser and Zipf-skewed where the word graph is
    near-complete (31 nodes, min degree 15), so core decomposition has
    real peel dynamics. Spark twin of _BIGRAM_EDGES_CTE."""
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")
    pairs = F.transform(
        safe_seq(F.size(toks) - 2),
        lambda i: F.struct(
            F.concat_ws(" ", F.element_at(toks, i),
                        F.element_at(toks, i + 1)).alias("src"),
            F.concat_ws(" ", F.element_at(toks, i + 1),
                        F.element_at(toks, i + 2)).alias("dst")))
    return (d.filter(F.size(toks) >= 3)
            .select(F.explode(pairs).alias("p"))
            .select("p.src", "p.dst").distinct())


_BIGRAM_EDGES_CTE = """
    SELECT DISTINCT array_to_string(w[i:i+1], ' ') AS src,
                    array_to_string(w[i+1:i+2], ' ') AS dst
    FROM (SELECT string_split(text, ' ') w FROM documents) t,
         unnest(range(1, len(w) - 1)) r(i)
    WHERE len(w) >= 3
"""


def q_word_kcore(spark, sf_dir):
    """Bounded-peel k-core (components.k_core, k=26, 6 rounds) over the
    adjacent-bigram graph — the third fully-value-hashed ITERATIVE
    algorithm (after the 10-iteration PageRank and the 8-merge BPE):
    the oracle unrolls the identical 6 peel rounds. At sf0.01 the peel
    converges in 3 rounds (16,058 → 15,315 edges), so rounds 4-6 are
    provably no-ops and the result is the true 26-core. SELF-VERIFYING
    (round 4): convergence is asserted in-query — min(deg) >= k on the
    returned frame is exactly the one-more-round-is-a-no-op fixpoint
    condition (k_core's contract), so a rounds bound that silently
    stopped short of convergence would raise instead of shipping a
    partial peel."""
    from ..operators.components import k_core
    edges = _bigram_edges(_t(spark, sf_dir, "documents"))
    out = k_core(edges, k=26, rounds=6).localCheckpoint()
    min_deg = out.agg(F.min("deg")).collect()[0][0]
    if min_deg is not None and min_deg < 26:
        raise AssertionError(
            f"k_core(rounds=6) returned a non-converged peel: "
            f"min(deg)={min_deg} < 26 — raise the rounds bound")
    return out.orderBy("id")


def _kcore_oracle_sql(edges_cte: str, k: int, rounds: int) -> str:
    # AS MATERIALIZED: each c[i-1] is referenced three times per round;
    # inlining would re-expand the whole chain (3^rounds parquet scans —
    # observed as DuckDB "too many open files")
    parts = [f"WITH bedges AS MATERIALIZED ({edges_cte}),",
             "c0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS x,"
             " GREATEST(src, dst) AS y FROM bedges WHERE src <> dst),"]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT z FROM ("
            f"SELECT z, COUNT(*) AS c FROM ("
            f"SELECT x AS z FROM c{i - 1} UNION ALL SELECT y FROM c{i - 1}"
            f") u GROUP BY z) d WHERE c >= {k}),")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT x, y FROM c{i - 1}"
            f" WHERE x IN (SELECT z FROM k{i})"
            f" AND y IN (SELECT z FROM k{i})),")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT id, COUNT(*) AS deg FROM ("
        f"SELECT x AS id FROM c{rounds} UNION ALL SELECT y FROM c{rounds}"
        f") u GROUP BY id ORDER BY id")
    return "\n".join(parts)


ORACLE_SQL["word_kcore"] = _kcore_oracle_sql(_BIGRAM_EDGES_CTE, 26, 6)
SQL_QUERIES["word_kcore"] = q_word_kcore


def q_word_communities(spark, sf_dir):
    """Deterministic synchronous label propagation
    (components.label_propagation, 4 pinned rounds, Raghavan et al.
    2007 with min-label tie-break) over the adjacent-bigram graph —
    the fourth fully-value-hashed iterative algorithm. The oracle
    unrolls the identical 4 rounds; the bound IS the semantics
    (synchronous LPA can oscillate, so no fixpoint claim is made)."""
    from ..operators.components import label_propagation
    edges = _bigram_edges(_t(spark, sf_dir, "documents"))
    return (label_propagation(edges, rounds=4)
            .withColumnRenamed("id", "node")
            .orderBy("node"))


def _lpa_oracle_sql(edges_cte: str, rounds: int) -> str:
    # AS MATERIALIZED for the same reason as the k-core oracle: each
    # round references the previous label frame once but the chain
    # would otherwise re-expand the parquet scan per round
    parts = [f"WITH bedges AS MATERIALIZED ({edges_cte}),",
             "sym AS MATERIALIZED ("
             "SELECT src AS a, dst AS b FROM bedges WHERE src <> dst"
             " UNION "
             "SELECT dst AS a, src AS b FROM bedges WHERE src <> dst),",
             "l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS community"
             " FROM sym),"]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT id, community FROM ("
            f"SELECT s.b AS id, l.community,"
            f" ROW_NUMBER() OVER (PARTITION BY s.b"
            f" ORDER BY COUNT(*) DESC, l.community) AS rn"
            f" FROM sym s JOIN l{i - 1} l ON s.a = l.id"
            f" GROUP BY s.b, l.community) t WHERE rn = 1),")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT id AS node, community FROM l{rounds} ORDER BY node")
    return "\n".join(parts)


ORACLE_SQL["word_communities"] = _lpa_oracle_sql(_BIGRAM_EDGES_CTE, 4)
SQL_QUERIES["word_communities"] = q_word_communities


def q_crawl_snapshot_diff(spark, sf_dir):
    """Incremental-crawl diff (snapshots.snapshot_diff): snapshot B is
    fabricated from the documents table — doc_id%17==0 disappear
    (gone), %13==0 get edited text (changed), and a %19==0 cohort
    re-appears under new ids (new) — then the per-status counts drive
    the reprocess-only-what-changed decision (at 10^12 docs the 'same'
    skip rate IS the cost model). One thin (key, digest) full-outer
    join; page bodies never shuffle."""
    from ..operators.snapshots import snapshot_diff
    d = _t(spark, sf_dir, "documents")
    old = d.select(F.concat(F.lit("doc://"), F.col("doc_id"))
                   .alias("url"), "text")
    surv = (d.filter(F.col("doc_id") % 17 != 0)
            .select(F.concat(F.lit("doc://"), F.col("doc_id"))
                    .alias("url"),
                    F.when(F.col("doc_id") % 13 == 0,
                           F.concat(F.col("text"), F.lit(" edited")))
                    .otherwise(F.col("text")).alias("text")))
    added = (d.filter(F.col("doc_id") % 19 == 0)
             .select(F.concat(F.lit("doc://"),
                              F.col("doc_id") + 10000).alias("url"),
                     "text"))
    new = surv.unionByName(added)
    return (snapshot_diff(old, new, "url")
            .groupBy("status").agg(F.count("*").alias("n"))
            .orderBy("status"))


ORACLE_SQL["crawl_snapshot_diff"] = """
    WITH old AS (SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                        md5(text) AS dg
                 FROM documents),
    nw AS (SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                  md5(CASE WHEN doc_id % 13 = 0 THEN text || ' edited'
                           ELSE text END) AS dg
           FROM documents WHERE doc_id % 17 <> 0
           UNION ALL
           SELECT 'doc://' || CAST(doc_id + 10000 AS VARCHAR),
                  md5(text)
           FROM documents WHERE doc_id % 19 = 0),
    j AS (SELECT COALESCE(old.url, nw.url) AS url,
                 CASE WHEN old.url IS NULL THEN 'new'
                      WHEN nw.url IS NULL THEN 'gone'
                      WHEN old.dg IS NOT DISTINCT FROM nw.dg THEN 'same'
                      ELSE 'changed' END AS status
          FROM old FULL OUTER JOIN nw ON old.url = nw.url)
    SELECT status, COUNT(*) AS n FROM j GROUP BY status ORDER BY status
"""
SQL_QUERIES["crawl_snapshot_diff"] = q_crawl_snapshot_diff


def q_events_zorder_pruning(spark, sf_dir):
    """Z-order layout pruning report (operators/layout.py): assign events
    to 32 'files' under three layouts — time-sorted, user-sorted, and
    Morton z-order over (user_id, epoch-second) — then count how many
    files' min/max footer ranges a point predicate on EITHER dimension
    would touch. The linear sorts each serve ONE probe family and
    degrade to scan-everything on the other; z-order stays within a few
    files for both — the Delta OPTIMIZE ZORDER / Iceberg sort-order
    rewrite rationale, value-verified because the interleaved-bit curve
    is integer-exact on both engines. File id = ntile over a total
    order (the deterministic twin of the scale path's
    repartitionByRange — see layout.zorder_write)."""
    from ..operators.layout import cluster_files, with_zvalue
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.floor(F.col("ts").cast("timestamp").cast("double"))
        .cast("long").alias("sec"))
    keyed = with_zvalue(ev, "user_id", "sec", bits=10)
    parts = []
    for layout, key in (("by_ts", "sec"), ("by_user", "user_id"),
                        ("zorder", "z")):
        f = cluster_files(keyed, [key, "event_id"], 32)
        parts.append(f.select(F.lit(layout).alias("layout"), "file_id",
                              "user_id", "sec"))
    files = parts[0].unionByName(parts[1]).unionByName(parts[2])
    stats = files.groupBy("layout", "file_id").agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min(F.expr("sec div 3600")).alias("hmin"),
        F.max(F.expr("sec div 3600")).alias("hmax"))
    u_probes = (ev.select("user_id").distinct()
                .filter(F.col("user_id") % 11 == 3)
                .withColumnRenamed("user_id", "p"))
    h_probes = (ev.select(F.expr("sec div 3600").alias("p")).distinct()
                .filter(F.col("p") % 29 == 5))
    u_touch = (stats.join(F.broadcast(u_probes),
                          (F.col("p") >= F.col("umin"))
                          & (F.col("p") <= F.col("umax")))
               .groupBy("layout")
               .agg(F.countDistinct("p").alias("n_probes"),
                    F.count("*").alias("files_touched"))
               .select("layout", F.lit("user_point").alias("probe_kind"),
                       "n_probes", "files_touched"))
    h_touch = (stats.join(F.broadcast(h_probes),
                          (F.col("p") >= F.col("hmin"))
                          & (F.col("p") <= F.col("hmax")))
               .groupBy("layout")
               .agg(F.countDistinct("p").alias("n_probes"),
                    F.count("*").alias("files_touched"))
               .select("layout", F.lit("hour_point").alias("probe_kind"),
                       "n_probes", "files_touched"))
    return u_touch.unionByName(h_touch).orderBy("layout", "probe_kind")


def _zorder_oracle_sql() -> str:
    from ..operators.layout import z_expr_sql
    z = z_expr_sql("user_id", "sec", "umin_g", "umax_g", "smin_g", "smax_g",
                   bits=10, dialect="duckdb")
    return f"""
    WITH e AS (SELECT event_id, user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS sec
               FROM events),
    b AS (SELECT MIN(user_id) AS umin_g, MAX(user_id) AS umax_g,
                 MIN(sec) AS smin_g, MAX(sec) AS smax_g FROM e),
    keyed AS (SELECT e.*, {z} AS z FROM e CROSS JOIN b),
    files AS (
      SELECT 'by_ts' AS layout,
             ntile(32) OVER (ORDER BY sec, event_id) AS file_id,
             user_id, sec FROM keyed
      UNION ALL
      SELECT 'by_user',
             ntile(32) OVER (ORDER BY user_id, event_id),
             user_id, sec FROM keyed
      UNION ALL
      SELECT 'zorder',
             ntile(32) OVER (ORDER BY z, event_id),
             user_id, sec FROM keyed),
    stats AS (SELECT layout, file_id,
                     MIN(user_id) AS umin, MAX(user_id) AS umax,
                     MIN(sec // 3600) AS hmin, MAX(sec // 3600) AS hmax
              FROM files GROUP BY layout, file_id),
    up AS (SELECT DISTINCT user_id AS p FROM e WHERE user_id % 11 = 3),
    hp AS (SELECT DISTINCT sec // 3600 AS p FROM e
           WHERE (sec // 3600) % 29 = 5),
    ut AS (SELECT layout, 'user_point' AS probe_kind,
                  COUNT(DISTINCT p) AS n_probes,
                  COUNT(*) AS files_touched
           FROM stats JOIN up ON p BETWEEN umin AND umax GROUP BY layout),
    ht AS (SELECT layout, 'hour_point' AS probe_kind,
                  COUNT(DISTINCT p) AS n_probes,
                  COUNT(*) AS files_touched
           FROM stats JOIN hp ON p BETWEEN hmin AND hmax GROUP BY layout)
    SELECT * FROM ut UNION ALL SELECT * FROM ht
    ORDER BY layout, probe_kind
"""


ORACLE_SQL["events_zorder_pruning"] = _zorder_oracle_sql()
SQL_QUERIES["events_zorder_pruning"] = q_events_zorder_pruning


def q_events_stream_enriched(spark, sf_dir):
    """Stream-static broadcast enrichment, VALUE-VERIFIED: the events
    file stream joins a static user→tier dim per micro-batch (broadcast,
    stateless) and rolls up integer cents/points per tier; drained with
    availableNow, the complete-mode result equals the plain batch
    join+agg, which the DuckDB oracle re-derives from user_id % 4
    arithmetic (streaming/windowed.stream_static_enriched_counts)."""
    from ..streaming.windowed import (stream_static_enriched_counts,
                                      user_tier_dim)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = user_tier_dim(batch)
    stream = (spark.readStream.schema(batch.schema)
              .option("pathGlobFilter", "events.parquet").parquet(sf_dir))
    agg = stream_static_enriched_counts(stream, dim)
    q = (agg.writeStream.format("memory")
         .queryName("events_stream_enriched")
         .outputMode("complete").trigger(availableNow=True).start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("events_stream_enriched did not drain in 120s")
    return (spark.table("events_stream_enriched")
            .select("tier", "n_events", "value_cents", "points")
            .orderBy("tier"))


ORACLE_SQL["events_stream_enriched"] = """
    SELECT CASE WHEN user_id % 4 = 0 THEN 'bronze'
                WHEN user_id % 4 = 1 THEN 'silver'
                WHEN user_id % 4 = 2 THEN 'gold'
                ELSE 'vip' END AS tier,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * (user_id % 4 + 1))
             AS BIGINT) AS points
    FROM events GROUP BY 1 ORDER BY 1
"""
SQL_QUERIES["events_stream_enriched"] = q_events_stream_enriched


def q_word_ppr_topk(spark, sf_dir):
    """Personalized PageRank (components.personalized_pagerank_exact):
    teleport restricted to a deterministic 3-word seed set (the three
    lexicographically-smallest source words) over the adjacent-word
    digraph — the GraphRAG 'rank entities by proximity to the query
    seeds' primitive, value-verified bit-exact against an 8x-unrolled
    integer SQL oracle (the global-teleport twin is word_pagerank)."""
    from ..operators.components import personalized_pagerank_exact
    edges = _word_edges(_t(spark, sf_dir, "documents"))
    seeds = (edges.select(F.col("src").alias("id")).distinct()
             .orderBy("id").limit(3))
    return (personalized_pagerank_exact(edges, seeds, n_iterations=8)
            .filter(F.col("rank_units") > 0)
            .orderBy(F.desc("rank_units"), "id")
            .limit(25))


def _ppr_oracle_sql(edge_cte: str, n_iter: int = 8, damping_pct: int = 85,
                    scale: int = 10 ** 12, k: int = 25,
                    n_seeds: int = 3) -> str:
    """Unrolled SQL twin of personalized_pagerank_exact — identical
    integer arithmetic, teleport mass split over the seeds CTE only."""
    keep = 100 - damping_pct
    parts = [
        f"WITH edges AS ({edge_cte}),",
        "nodes AS (SELECT DISTINCT src AS id FROM edges"
        " UNION SELECT DISTINCT dst FROM edges),",
        f"seeds AS (SELECT DISTINCT src AS id FROM edges"
        f" ORDER BY id LIMIT {n_seeds}),",
        "ns AS (SELECT COUNT(*) AS n FROM seeds),",
        "flagged AS (SELECT nodes.id,"
        " CASE WHEN seeds.id IS NULL THEN 0 ELSE 1 END AS seed"
        " FROM nodes LEFT JOIN seeds ON nodes.id = seeds.id),",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        "e AS (SELECT edges.src, edges.dst, deg.outdeg"
        " FROM edges JOIN deg ON edges.src = deg.src),",
        f"r0 AS (SELECT id, seed * ({scale} // ns.n) AS rank_units"
        " FROM flagged CROSS JOIN ns),",
    ]
    for i in range(n_iter):
        parts.append(
            f"r{i + 1} AS (SELECT flagged.id, "
            f"flagged.seed * (({scale} * {keep} // 100) // ns.n)"
            " + COALESCE(s.contrib, 0)"
            " AS rank_units FROM flagged CROSS JOIN ns LEFT JOIN ("
            f"SELECT e.dst AS id, CAST(SUM(((r{i}.rank_units"
            f" * {damping_pct}) // 100) // e.outdeg) AS BIGINT) AS contrib"
            f" FROM e JOIN r{i} ON e.src = r{i}.id GROUP BY e.dst"
            ") s ON flagged.id = s.id),")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, rank_units FROM r{n_iter}"
                 f" WHERE rank_units > 0"
                 f" ORDER BY rank_units DESC, id LIMIT {k}")
    return "\n".join(parts)


ORACLE_SQL["word_ppr_topk"] = _ppr_oracle_sql(_WORD_EDGES_CTE)
SQL_QUERIES["word_ppr_topk"] = q_word_ppr_topk


def q_events_salted_join_rollup(spark, sf_dir):
    """Skew-safe fact⋈dim join (operators/skew.salted_join): events
    joined to customer on user_id with an 8-way deterministic salt —
    the dim side replicated, the fact side salted from event_id — then
    a per-market-segment rollup. The oracle runs the PLAIN join + group
    by: salting must be invisible in the result (bit-identical counts
    and integer cents), visible only in the shuffle layout, where a hot
    user fans across 8 reducers instead of one."""
    from ..operators.skew import salted_join
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = salted_join(ev, cust, "user_id", "c_custkey",
                    salt_col="event_id", n_salts=8)
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_events"),
                 F.sum(_cents(F.col("value"))).alias("value_cents"))
            .orderBy("c_mktsegment"))


ORACLE_SQL["events_salted_join_rollup"] = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
"""
SQL_QUERIES["events_salted_join_rollup"] = q_events_salted_join_rollup


def q_events_hour_type_pivot(spark, sf_dir):
    """Pivoted per-hour-of-day × event-type count matrix (the wide
    activity heatmap): Spark-native ``.pivot()`` with the type list
    PINNED (no extra distinct pass to discover values — at scale the
    value-discovery scan is the hidden cost of open pivots, so the
    contract is an explicit vocabulary; unseen types would be dropped,
    absent (hour, type) cells are 0). The oracle is the portable
    conditional-aggregation spelling of the same matrix."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (ev.groupBy(F.hour("ts").cast("long").alias("hour"))
           .pivot("event_type", types).count())
    # a type absent in an hour yields null from pivot-count -> 0
    return (out.select("hour", *[F.coalesce(F.col(t), F.lit(0))
                                 .cast("long").alias(t) for t in types])
            .orderBy("hour"))


ORACLE_SQL["events_hour_type_pivot"] = """
    SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    ORDER BY hour
"""
SQL_QUERIES["events_hour_type_pivot"] = q_events_hour_type_pivot


def q_doc_length_hist_quantiles(spark, sf_dir):
    """Mergeable-quantile sketch (sketches.hist_bins/hist_quantiles):
    per-lang p50/p90/p99 of n_chars from a fixed-bin histogram
    (width 100). The sketch state is the (lang, bin) count table —
    bounded, shard-mergeable by SUM (the same algebraic merge law as
    the CMS grid; asserted in tests/test_sketches.py) — and the answer
    is the smallest bin whose cumulative count reaches p/1000 of the
    total via pure integer cross-multiplication, so the bracket
    [lo, lo+100) is bit-identical on both engines. The exact twin is
    doc_length_quantiles; this is the variant that still works when the
    values arrive in shards/micro-batches you can only merge."""
    from ..operators.sketches import hist_bins, hist_quantiles
    docs = _t(spark, sf_dir, "documents")
    bins = hist_bins(docs, "lang", "n_chars", bin_width=100)
    return (hist_quantiles(bins, "lang", [500, 900, 990], bin_width=100)
            .orderBy("lang", "permille"))


ORACLE_SQL["doc_length_hist_quantiles"] = """
    WITH b AS (SELECT lang, n_chars // 100 AS bin, COUNT(*) AS c
               FROM documents WHERE n_chars IS NOT NULL
               GROUP BY 1, 2),
    cum AS (SELECT lang, bin,
                   SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
                   SUM(c) OVER (PARTITION BY lang) AS total
            FROM b),
    p AS (SELECT UNNEST([500, 900, 990]) AS permille)
    SELECT cum.lang,
           CAST(p.permille AS INTEGER) AS permille,
           CAST(MIN(cum.bin) * 100 AS BIGINT) AS lo
    FROM cum CROSS JOIN p
    WHERE 1000 * cum.cum >= p.permille * cum.total
    GROUP BY cum.lang, p.permille
    ORDER BY lang, permille
"""
SQL_QUERIES["doc_length_hist_quantiles"] = q_doc_length_hist_quantiles


def q_word_negative_samples(spark, sf_dir):
    """KG-embedding training negatives by deterministic corrupt-tail
    sampling over the word digraph: each positive edge (src, dst) draws
    FOUR candidate negative tails — the vocabulary nodes at ranks
    md5(src:dst:i)[1:7] mod V, i in 0..3 — keeping each iff it is a CLEAN negative
    (not src, not dst, and (src, neg) is not a true edge; rejected
    candidates are dropped — acceptance sampling, rejection rate ≈
    graph density). Everything is one broadcast join of edges→ranked
    vocab plus one anti-join against the true edge set — no cross
    product, no RNG (the hash IS the sampler, so Spark and DuckDB draw
    identical negatives). The vocab ranking is a single global sort of
    the DISTINCT word set (≪ corpus; at web scale the entity vocabulary
    is the small table by construction)."""
    from ..operators.sketches import hex_int_col
    e = _word_edges(_t(spark, sf_dir, "documents"))
    nodes = (e.select(F.col("src").alias("w"))
             .union(e.select("dst")).distinct())
    w_all = Window.orderBy("w")
    ranked = nodes.select(
        "w", F.row_number().over(w_all).alias("rk"),
        F.count("*").over(
            Window.partitionBy(F.lit(1))).alias("v"))
    # 4 probes per positive (md5(src:dst:i), i in 0..3): the fixture
    # graph is dense, so single-probe acceptance is low; multi-probe is
    # also the scale contract (k negatives per positive for training)
    probes = e.select(
        "src", "dst",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"))
    slot = (hex_int_col(
        F.md5(F.concat_ws(":", "src", "dst", "i")), 1, 7)
            % F.col("v") + 1)
    cand = (probes.join(F.broadcast(ranked), ranked["rk"] == slot)
            .select("src", "dst", F.col("w").alias("neg")).distinct())
    clean = (cand.filter((F.col("neg") != F.col("src"))
                         & (F.col("neg") != F.col("dst")))
             .join(e.select(F.col("src").alias("s2"),
                            F.col("dst").alias("neg2")),
                   (F.col("src") == F.col("s2"))
                   & (F.col("neg") == F.col("neg2")), "left_anti"))
    return clean.orderBy("src", "dst", "neg")


from ..operators.sketches import hex_int_sql as _hex_int_sql  # noqa: E402

_NEG_SLOT = _hex_int_sql(
    "md5(e.src || ':' || e.dst || ':' || CAST(e.i AS VARCHAR))", 1, 7)
ORACLE_SQL["word_negative_samples"] = f"""
    WITH e AS ({_WORD_EDGES_CTE}),
    nodes AS (SELECT DISTINCT src AS w FROM e
              UNION SELECT DISTINCT dst FROM e),
    ranked AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS rk,
                      COUNT(*) OVER () AS v
               FROM nodes),
    probes AS (SELECT src, dst, i
               FROM e, unnest([0, 1, 2, 3]) p(i)),
    cand AS (SELECT DISTINCT e.src, e.dst, r.w AS neg
             FROM probes e JOIN ranked r
             ON r.rk = (({_NEG_SLOT}) % r.v) + 1)
    SELECT c.src, c.dst, c.neg
    FROM cand c
    WHERE c.neg <> c.src AND c.neg <> c.dst
      AND NOT EXISTS (SELECT 1 FROM e t
                      WHERE t.src = c.src AND t.dst = c.neg)
    ORDER BY src, dst, neg
"""
SQL_QUERIES["word_negative_samples"] = q_word_negative_samples


def q_doc_containment_pairs(spark, sf_dir):
    """Asymmetric CONTAINMENT detection (doc_b ⊆ doc_a) via stride-
    sampled k-gram fingerprint sets — the near-dup signal MinHash can't
    give (resemblance ≈ 0 when a small doc is embedded in a big one, yet
    containment = 1). Per doc: the DISTINCT md5 of every 16-char gram at
    stride 4 of lower(text); containment(b in a) = |FP(b) ∩ FP(a)| /
    |FP(b)|, reported as an exact integer permille. Candidate pairs come
    from a JOIN ON SHARED GRAM (LSH-style blocking, no cross product);
    grams appearing in > 50 documents are dropped from BOTH the
    intersection and the denominator (declared definition) — at web
    scale boilerplate grams are exactly the D² hot buckets, and they
    carry no containment signal. All integer arithmetic; both sides
    bounded to doc_id < 300 like the other brute-verified dup queries."""
    d = (_t(spark, sf_dir, "documents")
         .filter((F.col("doc_id") < 300) & F.col("text").isNotNull()))
    t = F.lower(F.col("text"))
    k = F.greatest((F.length(t) - 15), F.lit(1))
    grams = (d.select(
        "doc_id",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), k, F.lit(4)),
            lambda i: F.md5(t.substr(i, F.lit(16)))))).alias("g")))
    kept = (grams.join(
        grams.groupBy("g").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= 50).select("g"), "g"))
    nb = kept.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "g")
    b = kept.select(F.col("doc_id").alias("doc_b"), "g")
    shared = (a.join(b, "g")
              .filter(F.col("doc_a") != F.col("doc_b"))
              .groupBy("doc_a", "doc_b")
              .agg(F.count("*").alias("n_shared")))
    return (shared.join(nb.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .filter(F.col("n_shared") * 1000 >= F.col("n_fp") * 500)
            .select("doc_a", "doc_b", "n_shared",
                    F.col("n_fp").alias("n_b"),
                    F.expr("(1000 * n_shared) div n_fp")
                    .alias("containment_permille"))
            .orderBy("doc_a", "doc_b"))


ORACLE_SQL["doc_containment_pairs"] = """
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
               WHERE doc_id < 300 AND text IS NOT NULL),
    grams AS (SELECT DISTINCT doc_id, md5(substring(t, i.i, 16)) AS g
              FROM d, LATERAL unnest(generate_series(
                  1, greatest(length(t) - 15, 1), 4)) AS i(i)),
    kept AS (SELECT doc_id, g FROM grams
             WHERE g IN (SELECT g FROM grams
                         GROUP BY g HAVING COUNT(*) <= 50)),
    nb AS (SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id),
    shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      COUNT(*) AS n_shared
               FROM kept a JOIN kept b
                 ON a.g = b.g AND a.doc_id <> b.doc_id
               GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b, s.n_shared, nb.n_fp AS n_b,
           (1000 * s.n_shared) // nb.n_fp AS containment_permille
    FROM shared s JOIN nb ON nb.doc_id = s.doc_b
    WHERE s.n_shared * 1000 >= nb.n_fp * 500
    ORDER BY doc_a, doc_b
"""
SQL_QUERIES["doc_containment_pairs"] = q_doc_containment_pairs


def q_word_degree_salted(spark, sf_dir):
    """Hot-key-safe degree top-25 of the word co-occurrence graph via the
    round-4 salted two-phase variant (plans/queries.degree_topk_salted):
    celebrity tokens ('the', 'a') are exactly the power-law hubs whose
    endpoint rows a plain groupBy piles onto one reducer. Value-verified
    against the plain GROUP-BY oracle — the salt is algebraic, so the
    result is bit-identical."""
    from .queries import degree_topk_salted
    edges = _word_edges(_t(spark, sf_dir, "documents"))
    e = edges.select(F.col("src").alias("subj"), F.col("dst").alias("obj"),
                     F.lit("CO").alias("pred"))
    return degree_topk_salted(e, k=25, exclude_preds=())


ORACLE_SQL["word_degree_salted"] = f"""
    WITH edges AS ({_WORD_EDGES_CTE}),
    endpoints AS (SELECT src AS id FROM edges
                  UNION ALL SELECT dst AS id FROM edges)
    SELECT id, COUNT(*) AS degree
    FROM endpoints GROUP BY id
    ORDER BY degree DESC, id LIMIT 25
"""
SQL_QUERIES["word_degree_salted"] = q_word_degree_salted


def q_golden_artifact_stats(spark, sf_dir):
    """Round-4 parity evidence against the reference's REAL output: parse
    /root/reference/GRAPH_DOCS.json (written by the reference at
    code/pdf_graphrag.py:839-841) through the engine's S4 compatibility
    reader and emit per-type node counts + per-relation edge counts —
    HASH-verified against DuckDB's independent read_json parse of the
    same file (the one query whose input is the reference's own bytes,
    not synthesized test data)."""
    from ..sources.golden_json import (read_reference_graph_docs,
                                       reference_graph_docs_to_tables)
    gd = read_reference_graph_docs(spark, "/root/reference/GRAPH_DOCS.json")
    nodes, edges = reference_graph_docs_to_tables(gd)
    n = (nodes.groupBy(F.col("type").alias("name"))
         .agg(F.count("*").alias("n"))
         .select(F.lit("node").alias("kind"), "name", "n"))
    e = (edges.groupBy(F.col("pred").alias("name"))
         .agg(F.count("*").alias("n"))
         .select(F.lit("edge").alias("kind"), "name", "n"))
    return n.unionByName(e).orderBy("kind", "name")


ORACLE_SQL["golden_artifact_stats"] = """
    WITH gd AS (SELECT * FROM read_json_auto(
            '/root/reference/GRAPH_DOCS.json',
            maximum_object_size=104857600)),
    n AS (SELECT unnest(nodes) AS node FROM gd),
    r AS (SELECT unnest(relationships) AS rel FROM gd)
    SELECT 'node' AS kind, node.type AS name, COUNT(*) AS n
    FROM n GROUP BY 2
    UNION ALL
    SELECT 'edge' AS kind, rel.relation AS name, COUNT(*) AS n
    FROM r GROUP BY 2
    ORDER BY kind, name
"""
SQL_QUERIES["golden_artifact_stats"] = q_golden_artifact_stats


def q_golden_debug_artifact_stats(spark, sf_dir):
    """Round-5 parity evidence against the reference's SECOND real
    output: graph_docs_debug.json is the LLMGraphTransformer
    serialization (nested source/target relationship structs, LangChain
    Document source — written by ref code/romeo-juliet/test_single_query
    .py:27-28 over the Romeo & Juliet PDF; 123 page-docs, 710 nodes,
    714 relationships). Parsed through the engine's second S4
    compatibility reader and HASH-verified against DuckDB's independent
    read_json parse of the same bytes — together with
    golden_artifact_stats, BOTH serializations the reference emits are
    value-verified through the engine."""
    from ..sources.golden_json import (read_reference_debug_graph_docs,
                                       reference_debug_graph_docs_to_tables)
    gd = read_reference_debug_graph_docs(
        spark, "/root/reference/graph_docs_debug.json")
    nodes, edges = reference_debug_graph_docs_to_tables(gd)
    n = (nodes.groupBy(F.col("type").alias("name"))
         .agg(F.count("*").alias("n"))
         .select(F.lit("node").alias("kind"), "name", "n"))
    e = (edges.groupBy(F.col("pred").alias("name"))
         .agg(F.count("*").alias("n"))
         .select(F.lit("edge").alias("kind"), "name", "n"))
    return n.unionByName(e).orderBy("kind", "name")


ORACLE_SQL["golden_debug_artifact_stats"] = """
    WITH gd AS (SELECT * FROM read_json_auto(
            '/root/reference/graph_docs_debug.json',
            maximum_object_size=104857600)),
    n AS (SELECT unnest(nodes) AS node FROM gd),
    r AS (SELECT unnest(relationships) AS rel FROM gd)
    SELECT 'node' AS kind, node.type AS name, COUNT(*) AS n
    FROM n GROUP BY 2
    UNION ALL
    SELECT 'edge' AS kind, rel.type AS name, COUNT(*) AS n
    FROM r GROUP BY 2
    ORDER BY kind, name
"""
SQL_QUERIES["golden_debug_artifact_stats"] = q_golden_debug_artifact_stats


def q_doc_novelty_scores(spark, sf_dir):
    """First-witness n-gram novelty (round 4): per doc, the fraction of
    its DISTINCT word 5-grams whose first witness (min doc_id) is the
    doc itself — the novelty signal data-curriculum curation orders by
    (high = fresh content, low = rehash of earlier corpus). Plan shape:
    one (gram -> min id) vocab-sized aggregate feeds a doc-keyed count
    of first-witnessed grams, joined to the per-doc shingle totals —
    both joined frames are DOC-sized; the corpus-sized gram stream is
    aggregated once, never re-joined, and the totals come from the
    UNEXPLODED per-doc gram arrays (size(gs): a projection, zero
    shuffle — round-4 review fix; the gram explode exists only on the
    first-witness subtree). All-integer output (permille via div)."""
    from ..operators.dedup import _word_shingle_arrays
    d = _t(spark, sf_dir, "documents")
    base = _word_shingle_arrays(d, 5, "doc_id", "text", distinct=True)
    # explode_outer: InferFiltersFromGenerate re-evaluates the
    # interpreted gram transform for inner generates (see
    # dedup._word_shingles — 15x measured)
    sh = (base.select("id", F.explode_outer("gs").alias("g"))
          .filter(F.col("g").isNotNull()))
    first = sh.groupBy("g").agg(F.min("id").alias("first_doc"))
    novel = (first.groupBy(F.col("first_doc").alias("doc_id"))
             .agg(F.count("*").alias("n_novel")))
    totals = base.select(F.col("id").alias("doc_id"),
                         F.size("gs").cast("long").alias("n_shingles"))
    return (totals.join(novel, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"))
            .withColumn("novelty_permille",
                        F.expr("(1000 * n_novel) div n_shingles"))
            .orderBy("doc_id"))


ORACLE_SQL["doc_novelty_scores"] = """
    WITH sh AS (SELECT DISTINCT doc_id,
                       array_to_string(toks[i:i+4], ' ') AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents) t,
                     unnest(range(1, len(toks) - 3)) r(i)
                WHERE len(toks) >= 5),
    first AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g),
    novel AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
              FROM first GROUP BY 1),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1)
    SELECT t.doc_id, t.n_shingles,
           COALESCE(n.n_novel, 0) AS n_novel,
           (1000 * COALESCE(n.n_novel, 0)) // t.n_shingles
               AS novelty_permille
    FROM totals t LEFT JOIN novel n USING (doc_id)
    ORDER BY t.doc_id
"""
SQL_QUERIES["doc_novelty_scores"] = q_doc_novelty_scores
