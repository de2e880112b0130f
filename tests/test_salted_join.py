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
