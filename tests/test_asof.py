"""As-of join operator tests."""

from __future__ import annotations

from etl_docker_spark.operators.asof import asof_join_backward


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")],
        "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (3, 1, 999.0)],
        "k long, ts long, px double")
    out = {r.tag: r.px for r in asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["px"]).collect()}
    assert out == {"L1": 100.0, "L2": 200.0, "L3": None}


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 15, "L")], "k long, ts long, tag string")
    right = spark.createDataFrame([(1, 15, 7.0)], "k long, ts long, px double")
    row = asof_join_backward(left, right, ["k"], "ts", "ts", ["px"]).first()
    assert row.px == 7.0  # l.ts >= r.ts includes equality
