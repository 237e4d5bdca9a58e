"""Streaming tests: batch/stream parity via the memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_docker_spark.catalog import load_table
from etl_docker_spark.streaming import (
    merge_stream_into,
    session_aggregate,
    streaming_dedup,
    tumbling_aggregate,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-materialized with us timestamps for the streaming source."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(path)
    return path


def test_tumbling_batch_stream_parity(spark, events_dir):
    aggs = {"n": F.count("*"), "total": F.sum("value")}
    batch = load_table(spark, SF_SMOKE, "events")
    expected = {(r.window_start, r.event_type): (r.n, round(r.total, 6))
                for r in tumbling_aggregate(batch, "1 day", aggs,
                                            keys=["event_type"]).collect()}

    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = tumbling_aggregate(stream, "1 day", aggs, keys=["event_type"],
                             watermark="1 minute")
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("tumbled").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window_start, r.event_type): (r.n, round(r.total, 6))
           for r in spark.sql("SELECT * FROM tumbled").collect()}
    assert got == expected and len(got) > 0


def test_session_aggregate_batch(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
         (1, "2024-01-01 12:00:00"), (2, "2024-01-01 09:00:00")],
        "user_id long, ts_s string").select("user_id", F.to_timestamp("ts_s").alias("ts"))
    out = session_aggregate(df, "30 minutes", {"n": F.count("*")}).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.n)
    assert sorted(by_user[1]) == [1, 2]  # 2-event session + lone event
    assert by_user[2] == [1]


def test_streaming_dedup_watermark_bounded(spark, tmp_path):
    """The watermark-bounded regime emits each key once per horizon."""
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00"), (1, "a", "2024-01-01 10:00:30"),
         (2, "b", "2024-01-01 10:01:00")],
        "user_id long, event_type string, ts_s string",
    ).select("user_id", "event_type", F.to_timestamp("ts_s").alias("ts")) \
        .write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp").parquet(src)
    out = streaming_dedup(stream, ["user_id", "event_type"],
                          watermark="10 minutes")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_sink").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    got = sorted((r.user_id, r.event_type)
                 for r in spark.table("dedup_sink").collect())
    assert got == [(1, "a"), (2, "b")]

    # batch twin: plain distinct over the keys
    batch = spark.read.parquet(src)
    assert sorted((r.user_id, r.event_type)
                  for r in streaming_dedup(batch, ["user_id", "event_type"]).collect()) == got


def test_merge_stream_into(spark, tmp_path):
    src_dir, target = str(tmp_path / "src"), str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k long, v string, ver int") \
        .write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema("k long, v string, ver int").parquet(src_dir)
    q = merge_stream_into(stream, target, ["k"], order_by=[F.desc("ver")],
                          checkpoint=ckpt)
    q.awaitTermination(120)
    assert sorted((r.k, r.v) for r in spark.read.parquet(target).collect()) == \
        [(1, "a"), (2, "b")]

    # second micro-batch: update k=2, insert k=3
    spark.createDataFrame([(2, "b2", 2), (3, "c", 1)], "k long, v string, ver int") \
        .write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("k long, v string, ver int").parquet(src_dir)
    q = merge_stream_into(stream, target, ["k"], order_by=[F.desc("ver")],
                          checkpoint=ckpt)
    q.awaitTermination(120)
    assert sorted((r.k, r.v) for r in spark.read.parquet(target).collect()) == \
        [(1, "a"), (2, "b2"), (3, "c")]
