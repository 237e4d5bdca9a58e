"""operators/rank.py: the windowless bounded-frame rank must equal
row_number() under the same strict total order — including desc/asc
mixes, string keys, and ties broken by the tiebreak column only."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_docker_spark.operators.rank import rank_bounded


def _reference(df, order_cols):
    w = Window.orderBy(*order_cols)
    return {tuple(r[:-1]): r[-1] for r in
            df.withColumn("rank", F.row_number().over(w).cast("long"))
            .collect()}


def test_rank_bounded_matches_row_number(spark):
    df = spark.createDataFrame(
        [(7, "a", 3), (7, "b", 1), (2, "a", 2), (9, "c", 9), (2, "b", 5)],
        "score int, key string, id int")
    got = {(r["score"], r["key"], r["id"]): r["rank"] for r in
           rank_bounded(df, [("score", True), ("key", False),
                             ("id", False)]).collect()}
    ref = _reference(df.select("score", "key", "id"),
                     [F.desc("score"), F.asc("key"), F.asc("id")])
    assert got == ref
    assert sorted(got.values()) == [1, 2, 3, 4, 5]


def test_rank_bounded_tie_broken_by_later_key_only(spark):
    df = spark.createDataFrame([(5, 2), (5, 1), (5, 3)], "v int, id int")
    got = {r["id"]: r["rank"]
           for r in rank_bounded(df, [("v", True), ("id", False)]).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_rank_bounded_plans_no_window(spark):
    df = spark.range(8).select(F.col("id"), (F.col("id") % 3).alias("g"))
    plan = rank_bounded(df, [("g", False), ("id", False)]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_rank_bounded_rejects_empty_and_unknown_order(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one"):
        rank_bounded(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        rank_bounded(df, [("nope", False)])


def test_rank_bounded_fails_loudly_on_null_order_values(spark):
    # r9 ADVICE: NULL in an order column used to silently deflate ranks;
    # the contract violation must raise at execution, not mis-rank.
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    with pytest.raises(Exception, match="NULL in an order column"):
        rank_bounded(df, [("v", False)]).collect()
