"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-key running aggregates that survive across
micro-batches (count + sum + last-seen timestamp), emitting one updated row
per key per batch. This is the escape hatch for stateful logic the built-in
windows can't express (custom eviction, per-key models, counters with
business rules); state lives in the streaming state store, sized per key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [total],
        "last_ts": [last_ts],
    })


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running totals with persistent state (no watermark eviction:
    the key space is bounded by the user population)."""
    return (stream.groupBy("user_id")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
