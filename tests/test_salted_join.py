"""salted_join (operators/skew.py): result-identical to the plain join
on a deliberately hot-key fixture, with the hot key's fact rows actually
spread across salts."""

from __future__ import annotations

from pyspark.sql import functions as F


def _fixture(spark):
    # user 1 is pathologically hot: 5,000 of 5,050 fact rows
    fact = spark.range(5050).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 5000, F.lit(1))
         .otherwise(F.col("id") % 50).alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"))
    dim = spark.range(50).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("seg"), (F.col("id") % 5)).alias("seg"))
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    from llm_knowledge_graph_spark.operators.skew import salted_join
    fact, dim = _fixture(spark)
    got = salted_join(fact, dim, "user_id", "c_custkey",
                      salt_col="event_id", n_salts=8)
    want = fact.join(dim, fact["user_id"] == dim["c_custkey"]) \
               .drop("c_custkey")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_salted_join_spreads_hot_key(spark):
    from llm_knowledge_graph_spark.operators.skew import salted_join
    fact, dim = _fixture(spark)
    # the join key the hot rows carry must hash into MANY salt buckets
    salts = (fact.filter(F.col("user_id") == 1)
             .select(F.pmod(F.xxhash64("event_id"), F.lit(8)).alias("s"))
             .distinct().count())
    assert salts == 8
    # and the join still yields exactly one dim match per fact row
    n = salted_join(fact, dim, "user_id", "c_custkey",
                    salt_col="event_id", n_salts=8).count()
    assert n == 5050


def test_salted_join_shuffles_on_key_and_salt(spark):
    """Plan evidence for the skew claim: with broadcast off (the 'dim too
    big to broadcast' regime salting exists for), BOTH exchanges must
    hash-partition on (join_key, _salt) — the hot key's rows land on
    n_salts reducers, not one."""
    from llm_knowledge_graph_spark.operators.skew import salted_join
    fact, dim = _fixture(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(fact, dim, "user_id", "c_custkey",
                        salt_col="event_id", n_salts=8)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    import re
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    salted = [e for e in exchanges if ("_salt" in e or "_dim_salt" in e)
              and ("user_id" in e or "_dim_key" in e)]
    assert len(salted) >= 2, plan


def test_salted_join_same_key_name(spark):
    """Regression (round-4 ADVICE): with fact_key == dim_key (same column
    NAME on both sides) the join key must survive in the result — the old
    .drop(dim_key) removed it from BOTH sides."""
    from llm_knowledge_graph_spark.operators.skew import salted_join
    fact, dim = _fixture(spark)
    dim2 = dim.withColumnRenamed("c_custkey", "user_id")
    got = salted_join(fact, dim2, "user_id", "user_id",
                      salt_col="event_id", n_salts=8)
    assert "user_id" in got.columns
    rows = sorted(map(tuple, got.select("event_id", "user_id", "seg")
                      .collect()))
    want = sorted(map(tuple,
                      fact.join(dim, fact["user_id"] == dim["c_custkey"])
                          .select("event_id", "user_id", "seg").collect()))
    assert rows == want
