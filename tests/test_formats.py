"""Source-format breadth: the same queries run over ORC/CSV/JSON copies.

The engine is format-agnostic by construction (queries consume DataFrames);
this proves it by materializing a table in each format and comparing query
results value-for-value against the parquet original.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_docker_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def agg(df):
    return sorted(map(tuple,
        df.groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double").alias("q"),
               F.count("*").alias("n"))
          .collect()))


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_SMOKE, "lineitem")


def test_orc_roundtrip(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_orc")
    lineitem.write.mode("overwrite").orc(path)
    assert agg(spark.read.orc(path)) == agg(lineitem)


def test_csv_roundtrip(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_csv")
    lineitem.write.mode("overwrite").option("header", True).csv(path)
    back = (spark.read.schema(lineitem.schema)
            .option("header", True).csv(path))
    assert agg(back) == agg(lineitem)


def test_json_roundtrip(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_json")
    lineitem.write.mode("overwrite").json(path)
    back = spark.read.schema(lineitem.schema).json(path)
    assert agg(back) == agg(lineitem)


def test_delta_gated(spark, lineitem, tmp_path):
    from etl_docker_spark.sinks.lakehouse import write_delta

    with pytest.raises(NotImplementedError):
        write_delta(lineitem.limit(1), str(tmp_path / "delta"))
