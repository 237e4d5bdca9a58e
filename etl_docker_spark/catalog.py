"""Table catalog for the synthetic test corpus (TESTDATA.md).

Loaders return lazy DataFrames over parquet so Catalyst keeps predicate
pushdown / column pruning; nothing is cached here by default. On a real
cluster these would be external-catalog tables (partitioned by date /
company), but the access pattern — `t(spark, sf_dir, name)` — is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a raw
    # nanos LongType (spark.sql.legacy.parquet.nanosAsLong — set in session.py).
    # Surface it as a proper microsecond timestamp; `div` keeps the arithmetic
    # in exact integer space (ns floor-div 1000 == DuckDB's ns->us truncation).
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (query surface for spark.sql)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
