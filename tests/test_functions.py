"""Unit tests for the scalar function library (SURVEY.md §2.8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_docker_spark.functions import (
    concat_sep,
    conditional_negate,
    date_window,
    deleted_flag,
    empty_to_null,
    fiscal_address_field,
    fiscal_profit,
    parse_date_dmy,
    parse_ts_mixed,
    prefix_pad_unless_contains,
    remap_values,
    split_into,
)


def test_split_into(spark):
    df = spark.createDataFrame([("0001-00012345",)], ["inv"])
    pv, num = split_into("inv", "-", 2)
    row = df.select(pv.cast("int").alias("pv"), num.cast("int").alias("num")).first()
    assert (row.pv, row.num) == (1, 12345)


def test_empty_to_null_and_pad(spark):
    df = spark.createDataFrame([("",), ("123",), ("CLI99",)], ["code"])
    rows = df.select(
        empty_to_null("code").alias("n"),
        prefix_pad_unless_contains("code", "000", "CLI").alias("p"),
    ).collect()
    assert [r.n for r in rows] == [None, "123", "CLI99"]
    assert [r.p for r in rows] == ["000", "000123", "CLI99"]


def test_remap_and_concat(spark):
    df = spark.createDataFrame([(0, "BA", "CABA"), (3, "SF", "ROS")], ["cat", "a", "b"])
    rows = df.select(
        remap_values("cat", {0: 7}).alias("cat2"),
        concat_sep("; ", "a", "b").alias("loc"),
    ).collect()
    assert [r.cat2 for r in rows] == [7, 3]
    assert rows[0].loc == "BA; CABA"


def test_fiscal_profit_and_negate(spark):
    df = spark.createDataFrame(
        [(3, 121.0, 10.0), (8, 242.0, 5.0), (5, 121.0, 7.0)],
        ["itype", "neto_final", "disc"])
    rows = df.select(
        fiscal_profit("neto_final", "itype").alias("uf"),
        conditional_negate("disc", F.col("itype").isin(1, 2, 3)).alias("d"),
    ).collect()
    assert abs(rows[0].uf - 21.0) < 1e-9
    assert abs(rows[1].uf - 42.0) < 1e-9
    assert rows[2].uf is None
    assert rows[0].d == -10.0 and rows[2].d == 7.0  # type 3 negates, type 5 doesn't


def test_deleted_flag(spark):
    t1, t2 = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 5)
    df = spark.createDataFrame(
        [(t2, t1), (t1, t2), (t1, None), (None, None)],
        "del_ts timestamp, undel_ts timestamp")
    flags = [r.f for r in df.select(deleted_flag("del_ts", "undel_ts").alias("f")).collect()]
    # row 4: UnDeletion null disables even with no Deletion (CotyData_IPN.py:708)
    assert flags == [0, 1, 0, 0]


def test_parse_mixed_and_dmy(spark):
    df = spark.createDataFrame(
        [("2024-01-02T03:04:05", "15/03/2024"), ("02/01/2024 10:00:00", "01/01/2020")],
        ["ts", "d"])
    rows = df.select(parse_ts_mixed("ts").alias("ts"), parse_date_dmy("d").alias("d")).collect()
    assert rows[0].ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert rows[1].ts == dt.datetime(2024, 1, 2, 10, 0, 0)
    assert rows[0].d == dt.date(2024, 3, 15)


def test_fiscal_address(spark):
    df = spark.createDataFrame(
        [(1, [{"Type": "other", "City": "X", "State": "S1"},
              {"Type": "fiscal_address", "City": "BA", "State": "S2"}]),
         (2, [{"Type": "other", "City": "Y", "State": "S3"}])],
        "id long, Addresses array<struct<Type:string,City:string,State:string>>")
    rows = df.select(fiscal_address_field("Addresses", "City").alias("c")).collect()
    assert [r.c for r in rows] == ["BA", None]


def test_date_window():
    assert date_window(dt.date(2026, 8, 10)) == (dt.date(2026, 8, 7), dt.date(2026, 8, 9))  # Monday
    assert date_window(dt.date(2026, 8, 12)) == (dt.date(2026, 8, 11), dt.date(2026, 8, 11))
