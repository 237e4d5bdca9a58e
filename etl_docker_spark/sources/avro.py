"""Avro source/sink — environment-gated.

pyspark's wheel ships the Avro LIBRARY jars (avro-1.12.1) but not the
`spark-avro` datasource module, so `format("avro")` cannot resolve in this
container. Same gating pattern as sources/excel.py and sinks/lakehouse.py:
the call shape is real and tested; the gate raises with the exact fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_HINT = ("Avro support needs the spark-avro module on the classpath; "
         "launch with --packages org.apache.spark:spark-avro_2.13:<spark "
         "version> (not bundled in the pyspark wheel).")


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # AnalysisException: failed to find data source
        if "avro" in str(exc).lower():
            raise NotImplementedError(_HINT) from exc
        raise


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:
        if "avro" in str(exc).lower():
            raise NotImplementedError(_HINT) from exc
        raise
