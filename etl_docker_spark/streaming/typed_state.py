"""Typed-state streaming operator via transformWithStateInPandas (Spark 4).

The successor API to applyInPandasWithState (stateful.py): state is a set
of NAMED, TYPED variables (ValueState / ListState / MapState) with
per-variable TTL and timers, instead of one opaque tuple. This module
implements the per-key profile aggregate with it:

- ValueState "totals": (n, sum_micros) — running count + integer-exact sum
- MapState  "types":  event_type -> count — per-key distinct tracking that
  UPDATES IN PLACE (the map lives in the state store; only touched entries
  are read/written per batch — at 100 TB key-spaces this is the difference
  between O(delta) and O(state) per micro-batch)

Every accumulator is order- and batching-insensitive (counts, integer
sums, set membership), so the batch GROUP BY is a complete oracle no
matter how the stream is micro-batched.

Requires the RocksDB state-store provider (a transformWithState contract
in Spark 4) — which plans._util.stream_state_partitions already makes the
default — AND the `protobuf` package (the typed-state wire protocol to
the JVM state server). protobuf is not in this container, so the operator
is environment-gated like JDBC/Mongo: `typed_state_available()` reports
whether it can run, the unit test skips when it can't, and it stays out
of the oracle-gated query registry until the dependency is present.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = ("user_id long, n_events long, n_types long, "
                 "total_value_micros long")


def typed_state_available() -> bool:
    """transformWithState's driver worker imports google.protobuf; without
    it the streaming query crashes at state-schema validation."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def _micros(values: pd.Series) -> int:
    # integer cents ("micros" of the 2-decimal value column): half-away
    # rounding on positive doubles == floor(x*100 + 0.5), matching the
    # oracle's round(); summed as Python ints -> no float accumulation
    return int((values * 100 + 0.5).astype("int64").sum())


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile with typed state variables."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, sum_micros long")
        self._types = handle.getMapState(
            "types", "event_type string", "c long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, sum_micros = (self._totals.get() if self._totals.exists()
                         else (0, 0))
        for pdf in rows:
            n += len(pdf)
            sum_micros += _micros(pdf["value"])
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (self._types.getValue((etype,))
                        if self._types.containsKey((etype,)) else None)
                prev_c = prev[0] if prev is not None else 0
                self._types.updateValue((etype,), (prev_c + int(cnt),))
        self._totals.update((n, sum_micros))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n], "n_types": [n_types],
            "total_value_micros": [sum_micros],
        })

    def close(self) -> None:
        pass


def user_profiles(stream: DataFrame) -> DataFrame:
    """Per-user typed-state profile; one updated row per key per batch."""
    return (stream.groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserProfileProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))
