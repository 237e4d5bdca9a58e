"""Spark 4 Python DataSource tests (paginated_rest)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from etl_docker_spark.sources.rest_datasource import RestDataSource

    spark.dataSource.register(RestDataSource)
    return spark


def test_reads_pages_in_parallel(registered):
    df = (registered.read.format("paginated_rest")
          .schema("Id long, Name string")
          .option("fetcher", "etl_docker_spark.sources.fake_api:fetch_families")
          .option("num_pages", "3")
          .load())
    assert df.rdd.getNumPartitions() == 3      # one partition per page
    assert sorted(r.Id for r in df.collect()) == list(range(8))


def test_param_pushdown(registered):
    df = (registered.read.format("paginated_rest")
          .schema("Id long, Name string")
          .option("fetcher", "etl_docker_spark.sources.fake_api:fetch_families")
          .option("num_pages", "3")
          .option("param.min_id", "5")
          .load())
    assert sorted(r.Id for r in df.collect()) == [5, 6, 7]


def test_bad_fetcher_ref(registered):
    df = (registered.read.format("paginated_rest")
          .schema("Id long, Name string")
          .option("fetcher", "not_a_module_path")
          .option("num_pages", "1")
          .load())
    with pytest.raises(Exception):
        df.collect()
