"""Join operators (SURVEY.md §2.4 J1-J6, P11).

Every dimension lookup in the reference (merge / dict-map / loop-assign —
Funciones_CotyData.py:11-305) is the same physical operator here: a broadcast
hash join against a small dimension. Broadcasting is a HINT — Catalyst ignores
it if the dim outgrows `spark.sql.autoBroadcastJoinThreshold`, so these stay
correct when a "dimension" turns out huge; big-big joins fall back to
sort-merge with AQE skew splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(df: DataFrame, dim: DataFrame, on: Sequence[str] | Column,
           how: str = "left", select: Sequence[str] | None = None,
           broadcast_dim: bool = True) -> DataFrame:
    """J1-J4: equi-join against a dimension (broadcast by default).

    `how='left'` keeps unmatched rows with NULLs — the `.map` semantics of the
    reference's dict lookups; `how='inner'` drops them, matching its inner
    merges (Funciones_CotyData.py:197).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    out = df.join(d, on=on, how=how)
    return out.select(*select) if select else out


def two_hop_enrich(df: DataFrame, hop1: DataFrame, on1: Sequence[str],
                   hop2: DataFrame, on2: Sequence[str],
                   how: str = "left") -> DataFrame:
    """J5: the chained desc -> sucursal -> razón-social lookup
    (Funciones_CotyData.py:112-135) as two chained broadcast joins."""
    return enrich(enrich(df, hop1, on1, how=how), hop2, on2, how=how)


def flag_semi_join(df: DataFrame, keys_df: DataFrame, on: Sequence[str],
                   flag_name: str) -> DataFrame:
    """J6: boolean membership flag (the reference's credit-note SaleID set,
    CotyData_IPN.py:70-80) without collecting to the driver: broadcast
    left join against the distinct key set -> flag column.
    """
    marked = keys_df.select(*on).distinct().withColumn("__hit", F.lit(True))
    joined = df.join(F.broadcast(marked), on=list(on), how="left")
    return joined.withColumn(flag_name, F.coalesce(F.col("__hit"), F.lit(False))).drop("__hit")


def anti_join(df: DataFrame, existing: DataFrame, on: Sequence[str]) -> DataFrame:
    """P11: drop rows whose key already exists in `existing` (the reference's
    loop-delete at CotyData_IPN.py:2148-2154) as a single left_anti join."""
    return df.join(existing.select(*on).distinct(), on=list(on), how="left_anti")
