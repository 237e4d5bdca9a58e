"""Merge/upsert operator (SURVEY.md K2-K4, J8 — the staging+stored-proc idiom).

The reference's load contract (CotyData_IPN.py:207-214 and ~20 siblings) is:
append a batch into a CARGA_* staging table, then a server-side procedure
merges it into the final table so the final table reflects latest-state-by-PK.
Row-by-row cancellation UPDATEs (K3, :1186-1204) are the same contract with a
one-column payload.

Here the lakehouse is the primary store, so MERGE is: new-snapshot =
(target ANTI-JOIN updates on key) UNION updates — one shuffle-free broadcast
anti join when updates are small, idempotent on replay (re-merging the same
batch is a no-op), which is exactly the staging/proc guarantee. On Delta this
would be `MERGE INTO`; the DataFrame-level semantics are identical.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.operators.dedup import dedup_first


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str],
                 order_by: Sequence[Column | str] | None = None,
                 compare_target: bool = False) -> DataFrame:
    """Latest-state-by-PK merge: rows from `updates` replace target rows with
    the same key; unmatched target rows survive; unmatched updates insert.

    If `updates` may carry several versions of one key, pass `order_by`
    (descending recency first) to pick the winner deterministically (A4).

    `compare_target=True` makes the merge OUT-OF-ORDER SAFE: the winner is
    picked by `order_by` across target AND updates together, so a late
    batch carrying an older version of a key can never overwrite newer
    state — the CDC contract when upstream delivery isn't time-ordered.
    Requires `order_by`. Costs one shuffle on the keys instead of the
    broadcast anti join; at scale, partition the target so only affected
    key ranges re-sort.
    """
    if compare_target:
        if not order_by:
            raise ValueError("compare_target=True requires order_by")
        ups = updates.select(*target.columns)
        return dedup_first(target.unionByName(ups), keys, order_by)
    ups = dedup_first(updates, keys, order_by) if order_by else updates
    ups = ups.select(*target.columns)  # align column order for union
    kept = target.join(F.broadcast(ups.select(*keys).distinct()),
                       on=list(keys), how="left_anti")
    return kept.unionByName(ups)


def merge_upsert_path(spark: SparkSession, path: str, updates: DataFrame,
                      keys: Sequence[str],
                      order_by: Sequence[Column | str] | None = None,
                      compare_target: bool = False) -> None:
    """Path-based upsert into a parquet table (creates it on first write).

    Rewrites the snapshot (parquet has no row-level ops). On a real deployment
    the table would be date/company-partitioned and only affected partitions
    rewritten (dynamic partition overwrite); with Delta this becomes MERGE INTO.
    """
    if not os.path.exists(path):
        updates_final = (dedup_first(updates, keys, order_by) if order_by else updates)
        updates_final.write.mode("overwrite").parquet(path)
        return
    target = spark.read.parquet(path)
    merged = merge_upsert(target, updates, keys, order_by, compare_target)
    # Pin the merged snapshot BEFORE overwriting its own input, then write
    # once: replaces the tmp-parquet write + re-read + final rewrite (three
    # full passes of the snapshot through parquet encode/decode) with one
    # materialization and one write (optimization r12). Same
    # half-overwritten-on-crash exposure as the tmp staging had on its
    # final rewrite; on Delta this whole function is MERGE INTO and the
    # question disappears.
    pinned = merged.localCheckpoint()
    pinned.write.mode("overwrite").parquet(path)


def apply_updates(target: DataFrame, updates: DataFrame, keys: Sequence[str],
                  set_cols: dict[str, Column]) -> DataFrame:
    """K3: the row-by-row UPDATE loops (flag cancellations, enable/disable) as
    one set-based merge: rows matching `updates` keys get `set_cols` applied.
    """
    marked = updates.select(*keys).distinct().withColumn("__upd", F.lit(True))
    joined = target.join(F.broadcast(marked), on=list(keys), how="left")
    out = joined
    for name, expr in set_cols.items():
        out = out.withColumn(name, F.when(F.col("__upd"), expr).otherwise(F.col(name)))
    return out.drop("__upd")
