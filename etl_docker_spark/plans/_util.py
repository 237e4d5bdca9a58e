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


_ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                     "RocksDBStateStoreProvider")


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int | None = None,
                            track_rows: bool = False):
    """Scope streaming state-store knobs for a gate query.

    - `spark.sql.shuffle.partitions`: stateful streaming sizes its
      state-store instances (and their per-batch load/commit cost) to the
      shuffle-partition count, so the right number tracks STATE volume, not
      CPU count. The gate queries keep tiny state (hundreds of keys), where
      the default 32 stores are pure overhead — ~3x of each query's wall
      time. On a real cluster the same knob is sized up with expected key
      cardinality ($SPARK_GRAFT_STREAM_PARTITIONS).
    - state-store provider: RocksDB by default ($SPARK_GRAFT_STATE_STORE=
      hdfs to fall back). The default HDFS-backed store keeps every
      versioned key in JVM heap — at 100 TB/day state (dedup horizons,
      stream-stream join buffers) that OOMs; RocksDB spills to local SSD
      and bounds heap. Results are provider-independent (the s-family gate
      queries prove bit-equality; see tests/test_streaming_rocksdb.py).
    - rocksdb.trackTotalNumberOfRows: OFF unless `track_rows=True`.
      Tracking makes every commit count its rows (extra gets on each
      put/delete); the knob only feeds the `numRowsTotal` progress
      metric, never results. Off is the recommended setting for
      write-heavy state at scale and measured ~25% off s16's wall here
      (13.9 -> 10.3 s at sf0.1, optimization r11). Queries that GATE
      state-size observability (s21 numRowsTotal, s29 changefeed
      reconcile) pass track_rows=True and keep exact metrics.
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS")
    n = int(env) if env else (n or 4)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    changelog_key = ("spark.sql.streaming.stateStore.rocksdb."
                     "changelogCheckpointing.enabled")
    track_key = ("spark.sql.streaming.stateStore.rocksdb."
                 "trackTotalNumberOfRows")
    want_rocks = os.environ.get("SPARK_GRAFT_STATE_STORE", "rocksdb") \
        .lower() != "hdfs"
    # Changelog checkpointing uploads per-batch deltas instead of full
    # RocksDB snapshots — the right dial once snapshots are GBs (it was
    # measured WORSE at gate-sized state, see SCALE.md). Off by default;
    # $SPARK_GRAFT_ROCKSDB_CHANGELOG=1 flips it for re-measures.
    want_changelog = want_rocks and os.environ.get(
        "SPARK_GRAFT_ROCKSDB_CHANGELOG", "") == "1"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    before_provider = spark.conf.get(provider_key, None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    if want_rocks:
        spark.conf.set(provider_key, _ROCKSDB_PROVIDER)
        spark.conf.set(track_key, "true" if track_rows else "false")
    if want_changelog:
        spark.conf.set(changelog_key, "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        if want_rocks:
            if before_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, before_provider)
            spark.conf.unset(track_key)
        if want_changelog:
            spark.conf.unset(changelog_key)


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set-then-restore a runtime conf around a bounded EXECUTION (an
    action, a stream run) — the default tool for query-local conf. Not
    usable around a returned LAZY frame: the conf would be restored
    before the caller's action runs (the q87 recursion-limit lesson);
    for that case use `session_conf` and justify at the call site."""
    before = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)


def session_conf(spark: SparkSession, key: str, value: str) -> None:
    """The ONE sanctioned path for a session-level (no-restore) conf
    mutation from a query builder, so mutation sites are grep-auditable
    (builders must not call spark.conf.set directly — PLANS.md audits
    this). Legitimate only when the conf is consulted at EXECUTION time
    and the builder returns a lazy frame, so a scoped set-then-restore
    would revert before the action runs. Each call site carries its own
    justification comment."""
    spark.conf.set(key, value)


def ensure_session_confs(spark: SparkSession) -> None:
    """Make queries self-sufficient on a FOREIGN SparkSession (the external
    driver builds its own): nanos-parquet reads and UTC timestamp rendering
    are runtime-settable confs, so pin them here rather than assuming the
    session came from our factory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def stage_day_files(df: DataFrame, work: str, day_col: str = "dcol",
                    repeats: int = 1) -> str:
    """Stage a frame as ONE parquet file per `day_col` value with
    ascending mtimes under <work>/arrivals, so `maxFilesPerTrigger=1`
    replays it as one deterministic micro-batch per day (file i IS
    batch i). Returns the arrivals dir; `repeats` copies each day-file
    that many consecutive times (the at-least-once redelivery feeds).

    One-file-per-day comes from `repartition(day_col)`: each day's rows
    land wholly in one task, so each partition DIRECTORY gets exactly
    one file, while distinct days still write in PARALLEL — the
    coalesce(1) idiom this replaces serialized the whole feed through a
    single task (~10 s per rep per query at ~sf1, measured; optimization
    round 11 ported the round-6 `_stage_daily_arrivals` idiom to every
    staging site). Day-file CONTENT is unchanged up to row order, and
    every consumer aggregates order-insensitively within a batch
    (sums/counts/min/max/dedup-by-key-on-identical-payload)."""
    import os
    import shutil

    staged = os.path.join(work, "staged")
    df.repartition(F.col(day_col)).write.partitionBy(day_col) \
        .mode("overwrite").parquet(staged)
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals)
    days = sorted(d for d in os.listdir(staged)
                  if d.startswith(f"{day_col}="))
    seq = 0
    for d in days:
        src_dir = os.path.join(staged, d)
        matches = [f for f in os.listdir(src_dir)
                   if f.endswith(".parquet")]
        if len(matches) != 1:
            # a foreign maxRecordsPerFile (or any future write-path
            # change) splitting a day into multiple files must fail
            # HERE, not as a confusing downstream gate mismatch
            raise RuntimeError(
                f"expected exactly one parquet file in {src_dir}, "
                f"found {matches}")
        for _ in range(repeats):
            dst = os.path.join(arrivals, f"{seq:03d}.parquet")
            shutil.copyfile(os.path.join(src_dir, matches[0]), dst)
            os.utime(dst, (1700000000 + seq * 60,) * 2)
            seq += 1
    return arrivals
