"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query on sf0.001 (multi-dim star join + agg)
queries()       -> every declared query from SURVEY.md §2 + the LLM-data ops
oracle_sql()    -> DuckDB-runnable ANSI SQL twin for each query

The real implementations live in the etl_docker_spark package
(etl_docker_spark/plans/*); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_docker_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by nation across the 5-table star join."""
    return QUERIES["q02_revenue_by_nation"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
