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


def test_avro_gated(spark, lineitem, tmp_path):
    """Avro is a gated source here (spark-avro module not bundled): the
    gate must raise the actionable NotImplementedError, or — if a future
    environment ships the module — the roundtrip must be exact."""
    from etl_docker_spark.sources.avro import read_avro, write_avro

    try:
        write_avro(lineitem, str(tmp_path / "li_avro"))
    except NotImplementedError as exc:
        assert "spark-avro" in str(exc)
        return
    assert agg(read_avro(spark, str(tmp_path / "li_avro"))) == agg(lineitem)


def test_dynamic_partition_overwrite(spark, tmp_path):
    """overwrite_partitions_dynamic rewrites only the partitions present in
    the incoming frame; siblings survive (static overwrite would drop them)."""
    from etl_docker_spark.sinks.writers import (overwrite_parquet,
                                                overwrite_partitions_dynamic)

    path = str(tmp_path / "events_part")
    ev = load_table(spark, SF_SMOKE, "events")
    overwrite_parquet(ev, path, partition_by=["event_type"])
    before = dict(spark.read.parquet(path).groupBy("event_type")
                  .count().collect())

    patch = (ev.filter(F.col("event_type") == "view")
             .withColumn("value", F.lit(0.0)).limit(10))
    overwrite_partitions_dynamic(patch, path, ["event_type"])

    after_df = spark.read.parquet(path)
    after = dict(after_df.groupBy("event_type").count().collect())
    assert after["view"] == 10  # replaced wholesale by the 10-row patch
    for k, v in before.items():  # every sibling partition untouched
        if k != "view":
            assert after[k] == v
    assert (spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                           "static") != "dynamic")
