"""Typed-state streaming operator (transformWithStateInPandas).

Environment-gated: the typed-state wire protocol needs google.protobuf,
absent in this container — the end-to-end test skips here and runs where
the dependency exists (it is the s12 gate query in waiting). The
protocol-independent pieces (rounding, availability probe) always run.
"""

from __future__ import annotations

import pandas as pd
import pytest

from etl_docker_spark.streaming.typed_state import (
    _micros,
    typed_state_available,
)


def test_micros_is_integer_exact():
    s = pd.Series([0.01, 490.02, 123.45, 0.99])
    assert _micros(s) == 1 + 49002 + 12345 + 99


def test_availability_probe_is_honest():
    # must agree with an actual import attempt
    try:
        from google.protobuf import descriptor  # noqa: F401
        expected = True
    except ImportError:
        expected = False
    assert typed_state_available() is expected


@pytest.mark.skipif(not typed_state_available(),
                    reason="google.protobuf not installed "
                           "(transformWithState wire protocol)")
def test_typed_state_profiles_match_batch_oracle(spark):
    from pyspark.sql import functions as F

    from etl_docker_spark.plans._util import (_ROCKSDB_PROVIDER,
                                              stream_state_partitions)
    from etl_docker_spark.plans.advanced import _events_stream
    from etl_docker_spark.streaming.typed_state import user_profiles
    from tests.conftest import SF_SMOKE

    stream = _events_stream(spark, SF_SMOKE)
    out = user_profiles(stream.select("user_id", "event_type", "value"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   _ROCKSDB_PROVIDER)
    with stream_state_partitions(spark, 4):
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName("tws_probe").trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = {(r["user_id"], r["n_events"], r["n_types"],
            r["total_value_micros"])
           for r in (spark.table("tws_probe")
                     .withColumn("rn", F.row_number().over(w))
                     .filter(F.col("rn") == 1).drop("rn").collect())}
    from etl_docker_spark.catalog import load_table
    want = {(r["user_id"], r["n"], r["t"], r["m"])
            for r in (load_table(spark, SF_SMOKE, "events")
                      .groupBy("user_id")
                      .agg(F.count("*").alias("n"),
                           F.countDistinct("event_type").cast("long")
                           .alias("t"),
                           F.sum(F.round(F.col("value") * 100, 0)
                                 .cast("long")).alias("m"))
                      .collect())}
    assert got == want
