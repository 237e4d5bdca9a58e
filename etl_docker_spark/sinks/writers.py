"""Writers (SURVEY.md K1, K5, K7, K8).

- K1 chunked JDBC append -> `df.write.jdbc(batchsize=...)` (see sources.jdbc);
  the reference's ⌊2100/ncols⌋ chunk math (utils.py:40-46) is SQL Server bind-
  parameter bookkeeping that Spark's JDBC writer replaces with `batchsize`.
- K5 truncate-and-reload -> mode("overwrite").
- K7 Excel quarantine dump on failure (CotyData_IPN.py:190 et al.) ->
  parquet quarantine dir keyed by table+timestamp.
- K8 audit-log row per load (CotyData_IPN.py:19-61) -> append-only log table.
"""

from __future__ import annotations

import datetime as dt
import traceback

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType([
    T.StructField("load_table", T.StringType(), False),
    T.StructField("inserted_rows", T.LongType(), True),
    T.StructField("total_records", T.LongType(), True),
    T.StructField("status_ok", T.BooleanType(), False),
    T.StructField("error_msg", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("source_url", T.StringType(), True),
])


def append_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def overwrite_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions_dynamic(df: DataFrame, path: str,
                                 partition_by: list[str]) -> None:
    """K5 at partition granularity: rewrite ONLY the partitions present in
    `df` (partitionOverwriteMode=dynamic), leaving sibling partitions
    untouched. The idempotent re-load shape at 100 TB — re-running one
    day's load replaces that day's partition; a static overwrite would
    truncate the whole table first. The conf is scoped and restored so
    callers relying on static semantics are unaffected."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, before)


def audit_log_entry(spark: SparkSession, log_path: str, load_table: str,
                    inserted_rows: int | None, total_records: int | None,
                    status_ok: bool, error_msg: str | None = None,
                    source_url: str | None = None) -> None:
    """K8: one audit row per load attempt, appended to the log table."""
    row = [(load_table, inserted_rows, total_records, status_ok, error_msg,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None), source_url)]
    spark.createDataFrame(row, AUDIT_SCHEMA).write.mode("append").parquet(log_path)


def write_with_quarantine(spark: SparkSession, df: DataFrame, path: str,
                          quarantine_dir: str, log_path: str,
                          load_table: str, mode: str = "append",
                          source_url: str | None = None) -> bool:
    """K7+K8: attempt the load; on failure dump the batch to quarantine for
    manual replay and log the error. Returns True on success."""
    try:
        n = df.count()
        df.write.mode(mode).parquet(path)
        audit_log_entry(spark, log_path, load_table, n, n, True, None, source_url)
        return True
    except Exception:
        err = traceback.format_exc()[-2000:]
        stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%dT%H%M%S%f")
        try:
            df.write.mode("overwrite").parquet(f"{quarantine_dir}/{load_table}/{stamp}")
        except Exception:
            pass  # quarantine itself failed; the audit row still records the error
        audit_log_entry(spark, log_path, load_table, 0, None, False, err, source_url)
        return False


def route_rows_to_quarantine(df: DataFrame, valid, quarantine_dir: str,
                             log_path: str | None = None,
                             load_table: str = "unknown") -> DataFrame:
    """K7 at ROW granularity: split `df` on the `valid` boolean column
    expression, persist the invalid rows to a quarantine parquet dir for
    manual replay, and return the clean frame.

    The reference quarantines whole failed batches (CotyData_IPN.py:190);
    at 100 TB one malformed row must not poison a partition-sized batch, so
    the router is a single filter pass each way — no shuffle, predicate
    evaluated scan-side twice (cheaper than caching the full input just to
    split it once). An audit row records the quarantine count when
    `log_path` is given.

    NULL predicate rows go to QUARANTINE: `valid` is three-valued, and a
    plain filter(valid)/filter(~valid) pair silently drops NULL rows from
    BOTH sides (ADVICE r3) — a validity check that cannot decide is a
    failed validity check. The clean+quarantine partition invariant
    requires a DETERMINISTIC input: the two passes re-evaluate `df`, so a
    non-deterministic upstream (a re-fetched REST source, a sample)
    must be localCheckpoint()ed by the caller first.
    """
    spark = df.sparkSession
    decided = F.coalesce(valid, F.lit(False))
    bad = df.filter(~decided)
    bad.write.mode("overwrite").parquet(quarantine_dir)
    n_bad = spark.read.parquet(quarantine_dir).count()
    if log_path is not None:
        audit_log_entry(spark, log_path, load_table, None, n_bad,
                        False, f"{n_bad} rows quarantined")
    return df.filter(decided)
