"""SCD2 history operator tests."""

from __future__ import annotations

import datetime as dt

from etl_docker_spark.operators.scd2 import scd2_apply, scd2_as_of


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_bootstrap_and_update(spark):
    batch1 = spark.createDataFrame(
        [(1, 10.0, ts("2024-01-01")), (2, 20.0, ts("2024-01-01"))],
        "item long, price double, effective_ts timestamp")
    h1 = scd2_apply(None, batch1, keys=["item"], attrs=["price"])
    assert all(r.is_current for r in h1.collect())

    batch2 = spark.createDataFrame(
        [(1, 12.0, ts("2024-02-01")),   # real change
         (2, 20.0, ts("2024-02-01"))],  # no-op: same price
        "item long, price double, effective_ts timestamp")
    h2 = scd2_apply(h1, batch2, keys=["item"], attrs=["price"])
    rows = {(r.item, r.valid_from): r for r in h2.collect()}
    assert len(rows) == 3  # item 2's no-op produced no version
    old = rows[(1, ts("2024-01-01"))]
    assert old.valid_to == ts("2024-02-01") and old.is_current is False
    assert rows[(1, ts("2024-02-01"))].is_current is True
    assert rows[(2, ts("2024-01-01"))].is_current is True


def test_scd2_idempotent_and_as_of(spark):
    batch = spark.createDataFrame(
        [(1, 10.0, ts("2024-01-01")), (1, 12.0, ts("2024-03-01"))],
        "item long, price double, effective_ts timestamp")
    h = scd2_apply(None, batch, keys=["item"], attrs=["price"])
    again = scd2_apply(h, batch, keys=["item"], attrs=["price"])
    assert sorted(map(tuple, h.collect())) == sorted(map(tuple, again.collect()))

    at_feb = scd2_as_of(h, ts("2024-02-01")).collect()
    assert len(at_feb) == 1 and at_feb[0].price == 10.0
    at_apr = scd2_as_of(h, ts("2024-04-01")).collect()
    assert at_apr[0].price == 12.0