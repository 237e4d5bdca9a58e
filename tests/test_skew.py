"""Skew-mitigation tests: salting correctness + bucketed no-shuffle joins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_docker_spark.operators.skew import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + normal keys
    rows = [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 12)]
    big = spark.createDataFrame(rows, "k int, payload int")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 12)], "k int, name string")

    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], salt_from="payload", n=8)\
        .select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salted big side actually spreads the hot key over multiple buckets
    spread = (big.withColumn("s", F.pmod(F.xxhash64("payload"), F.lit(8)))
              .filter(F.col("k") == 1).select("s").distinct().count())
    assert spread > 1


def test_bucketed_join_has_no_exchange(spark):
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    write_bucketed(facts, "b_facts", ["k"], num_buckets=8, sort_by=["k"])
    write_bucketed(dims, "b_dims", ["k"], num_buckets=8, sort_by=["k"])
    try:
        joined = (spark.table("b_facts").join(spark.table("b_dims"), "k")
                  .groupBy("k").agg(F.sum("v").alias("sv"), F.max("w").alias("mw")))
        # force a non-broadcast join so bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # no shuffle below the join: both sides read pre-bucketed
        assert not re.search(r"\(\d+\) Exchange", join_section), join_section
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")
