"""Tests for the paginated REST source (fake fetcher, no network)."""

from __future__ import annotations

from pyspark.sql import types as T

from etl_docker_spark.sources import PageSpec, RestEndpoint, paginated_read, paginated_read_driver

SCHEMA = T.StructType([
    T.StructField("Id", T.LongType()),
    T.StructField("Name", T.StringType()),
])

ENDPOINT = RestEndpoint(name="families", schema=SCHEMA, page=PageSpec(page_size=3))


def fake_fetch(page: int, params):
    # 2.5 pages of 3 records -> 8 records total
    all_rows = [{"Id": i, "Name": f"fam{i}"} for i in range(8)]
    return all_rows[page * 3:(page + 1) * 3]


def test_driver_read(spark):
    df = paginated_read_driver(spark, ENDPOINT, fake_fetch)
    assert df.count() == 8
    assert df.schema == SCHEMA


def test_distributed_read(spark):
    df = paginated_read(spark, ENDPOINT, fake_fetch, num_pages=3)
    assert sorted(r.Id for r in df.collect()) == list(range(8))
    assert df.schema == SCHEMA


def test_filter_pushdown_params(spark):
    seen = {}

    def capture_fetch(page: int, params):
        seen.update(params)
        return [] if page else [{"Id": 1, "Name": "x"}]

    ep = RestEndpoint(
        name="sales", schema=SCHEMA,
        param_fn=lambda p: {"date_from": p["date_from"].strftime("%d/%m/%Y")})
    import datetime as dt

    df = paginated_read_driver(spark, ep, capture_fetch,
                               predicates={"date_from": dt.date(2024, 3, 1)})
    assert df.count() == 1
    assert seen == {"date_from": "01/03/2024"}  # dd/MM/yyyy serialization (API_IPN.py:56-58)
