"""Round-4 queries: the EP3 incremental lifecycle end-to-end under the
oracle gate, plus new breadth operators.

q70 closes the last orchestration gap from the round-3 verdict: the
bookmark-driven incremental job (pipelines/incremental.py) was
golden-tested but never oracle-gated END TO END. Here the whole
lifecycle runs inside the query: first-run weekday window -> three
windowed pulls (created/modified/deleted) -> out-of-order-safe merge ->
bookmark advance -> second run resuming from the bookmark -> third run
proving the caught-up no-op. The oracle is the final merged snapshot
plus the lifecycle counters as a VALUES literal (the q68/q69 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROUND4: dict = {}

# ---------------------------------------------------------------- q70


def q70_incremental_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """EP3's full lifecycle (F13 bookmarks + S1 windowed pulls + K2/K3
    merge semantics) gated as one query.

    Three scheduled runs against the deterministic windowed feed
    (sources/fake_api.py, reference contract CotyData_IPN.py:597-601):

      run 1  Monday 2024-03-11, no bookmark -> weekday window Fri..Sun
             (dag_maestros.py:10-22) pulls the 03-08..03-10 slice;
      run 2  Thursday 2024-03-14 -> bookmark resumes 03-11..03-13: item 2
             arrives at v3 (skipping v2 — as-of semantics), items 1 and 4
             arrive as deletion snapshots and must flip ENABLED without
             losing their attributes (same-instant delete-beats-modify
             tie-break, pipelines/incremental.py:_order);
      run 3  2024-03-14 again -> start > end, caught_up no-op (the
             re-run idempotence half of the staging/MERGE contract).

    The result is the final target snapshot with the three run statuses
    and the bookmark high-water mark as pinned columns. `sf` is unused —
    the endpoint and the bookmark table ARE the inputs.
    """
    import datetime as dt
    import shutil
    import tempfile

    from etl_docker_spark.orchestration import Bookmarks, JobContext
    from etl_docker_spark.pipelines.incremental import (
        JOB_NAME, read_target, run_items_incremental)
    from etl_docker_spark.sources.fake_api import fetch_items_windowed

    work = tempfile.mkdtemp(prefix="q70_")
    try:
        ctx = JobContext(spark=spark, warehouse=f"{work}/wh",
                         log_path=f"{work}/audit",
                         quarantine=f"{work}/quar")
        r1 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 11))
        r2 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 14))
        r3 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 14))
        mark = Bookmarks(ctx).last_window_end(JOB_NAME)
        out = (read_target(ctx)
               .select("Id", "Code", "Description", "CreationDatetime",
                       "ModificationDatetime", "ENABLED")
               .withColumn("r1_rows", F.lit(int(r1["rows"])))
               .withColumn("r2_rows", F.lit(int(r2["rows"])))
               .withColumn("r3_status", F.lit(str(r3["status"])))
               .withColumn("bookmark_end", F.lit(mark.isoformat()))
               .localCheckpoint())  # pin before the workdir is deleted
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q70_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'SKU-1', 'alpha v1', '2024-03-10', '2024-03-10',
   FALSE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(2 AS BIGINT), 'SKU-2', 'beta v3', '2024-03-10', '2024-03-13',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(3 AS BIGINT), 'SKU-3', 'gamma v2', '2024-03-10', '2024-03-12',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(4 AS BIGINT), 'SKU-4', 'delta v1', '2024-03-11', '2024-03-11',
   FALSE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(5 AS BIGINT), 'SKU-5', 'eps v1', '2024-03-12', '2024-03-12',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(6 AS BIGINT), 'SKU-6', 'zeta v1', '2024-03-13', '2024-03-13',
   TRUE, 6, 10, 'caught_up', '2024-03-13')
) AS t(Id, Code, Description, CreationDatetime, ModificationDatetime,
       ENABLED, r1_rows, r2_rows, r3_status, bookmark_end)
"""

ROUND4.update({
    "q70_incremental_lifecycle": (q70_incremental_lifecycle, Q70_SQL),
})

# ---------------------------------------------------------------- s13

_S13_SPLIT = "2024-01-16"   # events before this date arrive LATE
_S13_BRIDGE = "2024-02-14"  # advances the (lagging) late-event watermark
_S13_FLUSH = "2024-02-15"   # sentinel that closes every real window


def s13_stream_late_data_drop(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics, gated. Every other s-query
    proves the streaming engine loses nothing (oracle = full batch
    answer); none proves the opposite contract — that data arriving
    after the watermark has passed its window is EXCLUDED. At 100 TB
    the drop rule is what bounds streaming state; an engine that
    silently keeps (or double-counts) late rows passes all no-loss
    gates and still has unbounded state.

    Arrival order is made deterministic with one file per micro-batch
    (maxFilesPerTrigger=1, mtime-ordered, the s12 pattern):

      batch 1  events with ts >= 2024-01-16 (on time).
      batch 2  a single '_bridge' row (2024-02-14): Spark >= 3.4 filters
               late events with the PREVIOUS micro-batch's watermark
               (lateEvents wm lags eviction wm by one batch — verified
               empirically on this engine), so one bridge batch is
               needed before the watermark from batch 1's data governs
               input filtering.
      batch 3  events with ts <  2024-01-16 — entirely late; append
               mode must discard all of them (the engine reports them
               via numRowsDroppedByWatermark).
      batch 4  one far-future sentinel row (2024-02-15) that pushes the
               watermark past every real window so the January and
               bridge windows emit (its own window stays open and never
               appears; the bridge window is filtered from the result).

    Oracle: the daily per-type aggregate over ONLY the on-time slice —
    if any late row survived (or any on-time row was dropped), counts
    or decimal-exact sums diverge.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (dsum, stream_state_partitions,
                                              t)
    from etl_docker_spark.streaming import tumbling_aggregate

    ev = t(spark, sf, "events").select("ts", "event_type", "value")
    on_time = ev.filter(F.col("ts") >= F.lit(_S13_SPLIT).cast("timestamp"))
    late = ev.filter(F.col("ts") < F.lit(_S13_SPLIT).cast("timestamp"))

    def one_row(ts: str, etype: str):
        return spark.createDataFrame(
            [(etype, 0.0)], "event_type string, value double").select(
            F.lit(ts).cast("timestamp").alias("ts"), "event_type", "value")

    bridge = one_row(_S13_BRIDGE, "_bridge")
    sentinel = one_row(_S13_FLUSH, "_flush")

    work = tempfile.mkdtemp(prefix="s13_")
    try:
        arrivals = os.path.join(work, "arrivals")
        os.makedirs(arrivals)
        for i, part in enumerate((on_time, bridge, late, sentinel)):
            stage = os.path.join(work, f"stage{i}")
            part.coalesce(1).write.mode("overwrite").parquet(stage)
            src = next(f for f in os.listdir(stage)
                       if f.endswith(".parquet"))
            dst = os.path.join(arrivals, f"{i:03d}.parquet")
            shutil.copyfile(os.path.join(stage, src), dst)
            os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = tumbling_aggregate(
            stream, "1 day",
            {"n_events": F.count("*"), "total_value": dsum("value")},
            keys=["event_type"], watermark="0 seconds")
        name = f"s13_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (agg.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return (spark.table(name)
                .filter(~F.col("event_type").isin("_flush", "_bridge"))
                .select(F.col("window_start").alias("day"), "event_type",
                        "n_events", "total_value")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S13_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM events
WHERE ts >= TIMESTAMP '{_S13_SPLIT} 00:00:00'
GROUP BY 1, 2
"""

ROUND4.update({
    "s13_stream_late_data_drop": (s13_stream_late_data_drop, S13_SQL),
})
