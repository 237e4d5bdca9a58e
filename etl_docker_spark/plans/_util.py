"""Shared helpers for the query surface.

Cross-engine determinism rules used throughout:
- Money/quantity aggregates run over DECIMAL(18,4) and cast the RESULT to
  DOUBLE: decimal arithmetic is exact, so the sum is independent of
  partitioning/order and the final double is bit-identical in any engine.
- Averages are written sum/count on identical operands (never engine AVG,
  whose internal accumulation differs).
- Integer-valued outputs are pinned to BIGINT on both sides (Spark `size`
  is INT, DuckDB `len` is BIGINT — casting removes the schema skew).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.catalog import load_table

# Precision discipline: DECIMAL(12,4) money × DECIMAL(6,4) rate × DECIMAL(6,4)
# rate = scale-12 result under 38 digits in BOTH Spark ((26,12)) and DuckDB
# ((24,12)) — no engine-specific precision-loss rounding ever kicks in.
DEC = "decimal(12,4)"
RATE = "decimal(6,4)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def rate(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum, surfaced as DOUBLE."""
    return F.sum(dec(col)).cast("double")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, name)


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int | None = None):
    """Scope `spark.sql.shuffle.partitions` down for a streaming query.

    Stateful streaming sizes its state-store instances (and their per-batch
    load/commit cost) to the shuffle-partition count, so the right number
    tracks STATE volume, not CPU count. The gate queries keep tiny state
    (hundreds of keys), where the default 32 stores are pure overhead —
    ~3x of each query's wall time. On a real cluster the same knob is sized
    up with expected key cardinality ($SPARK_GRAFT_STREAM_PARTITIONS).
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    n = int(env) if env else (n or 4)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def ensure_session_confs(spark: SparkSession) -> None:
    """Make queries self-sufficient on a FOREIGN SparkSession (the external
    driver builds its own): nanos-parquet reads and UTC timestamp rendering
    are runtime-settable confs, so pin them here rather than assuming the
    session came from our factory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
