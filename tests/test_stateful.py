"""applyInPandasWithState operator test: state persists across micro-batches."""

from __future__ import annotations

from etl_docker_spark.streaming.stateful import running_user_totals


def test_state_survives_across_batches(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    schema = "user_id long, ts timestamp, value double"

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), 5.0), (1, dt.datetime(2024, 1, 1, 11), 7.0),
         (2, dt.datetime(2024, 1, 1, 9), 1.0)], schema) \
        .write.mode("append").parquet(src)

    # one long-running query, multiple micro-batches: the state store carries
    # totals between them (memory sink can't recover checkpoints, so the
    # cross-batch guarantee is observed within a live query)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (running_user_totals(stream)
         .writeStream.outputMode("update").format("memory")
         .queryName("running_totals").start())
    try:
        q.processAllAvailable()
        first = {r.user_id: (r.n_events, r.total_value)
                 for r in spark.sql("SELECT * FROM running_totals").collect()}
        assert first[1] == (2, 12.0) and first[2] == (1, 1.0)

        spark.createDataFrame([(1, dt.datetime(2024, 1, 2, 10), 3.0)], schema) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        # update-mode memory sink appends updated rows; the LAST row per key
        # is the current state
        rows = spark.sql("SELECT * FROM running_totals").collect()
        latest = {}
        for r in rows:
            latest[r.user_id] = (r.n_events, r.total_value)
        assert latest[1] == (3, 15.0)  # 12+3, 2+1 — state persisted
    finally:
        q.stop()
