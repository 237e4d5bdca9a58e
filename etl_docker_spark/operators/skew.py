"""Skew mitigation: salted broadcast-free joins and bucketed co-location.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py); `salted_join` is the explicit fallback for the pathological
case AQE can't fix — a shuffled join where ONE key holds a large share of
the rows (e.g. the null/default customer, a viral document cluster).

Mechanics: the big side spreads each hot key over `n` salt buckets
(deterministic: hash of a designated column, not rand(), so retries and
replays produce identical placement); the small side replicates each row
n times. The join key becomes (key, salt) — the hot key's rows now land on
n reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                salt_from: str, n: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the big side salted over `n` buckets.

    `salt_from` names a big-side column whose hash spreads rows (any
    roughly-unique column: a line number, an id). The small side is
    replicated n-fold — keep it small relative to n*|small|.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n)).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = salted_big.join(salted_small, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   num_buckets: int = 32, sort_by: Sequence[str] | None = None) -> None:
    """Persist a table bucketed on its join keys (co-located joins later).

    Two tables bucketed the same way join WITHOUT an exchange — the shuffle
    is paid once at write time instead of on every join. The test suite
    asserts the no-Exchange property on the resulting plan.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
