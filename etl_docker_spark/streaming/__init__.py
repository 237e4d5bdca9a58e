"""Structured Streaming operators.

The reference has no streaming (SURVEY.md §2.9) — its nearest analogues are
incremental date-window pulls and CDC-style cancellation updates. This module
provides the Spark-native versions those become at scale, plus the standard
streaming aggregations a training-data pipeline needs.

Design rule: every aggregation here is written against the unified DataFrame
API, so the SAME function works on a batch frame (for tests/oracles) and a
streaming frame (for production) — `F.window`/`F.session_window` are
batch-compatible.
"""

from etl_docker_spark.streaming.windows import (
    session_aggregate,
    streaming_dedup,
    tumbling_aggregate,
    with_watermark,
)
from etl_docker_spark.streaming.cdc import merge_stream_into

__all__ = [
    "merge_stream_into",
    "session_aggregate",
    "streaming_dedup",
    "tumbling_aggregate",
    "with_watermark",
]
