"""SCD2 history merge — the generalization of the reference's *_HISTORICO
tables (PRECIOS_HISTORICO / COSTOS_HISTORICO keep effective-dated versions;
CotyData_IPN.py:1738-1801 appends them manually).

Emulated without Delta (SURVEY.md §4.2 / pyspark guide "CDC/SCD2"):
anti-join + union + window. One shuffle on the business key; idempotent —
re-applying the same batch yields the same history.

Contract: history rows carry (key..., attrs..., valid_from, valid_to,
is_current); an incoming batch of (key, attrs, effective_ts) closes the
overlapping current row (valid_to = new valid_from) and inserts the new
version. Unchanged rows (same attrs as the current version) are skipped.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(history: DataFrame | None, updates: DataFrame,
               keys: Sequence[str], attrs: Sequence[str],
               ts_col: str = "effective_ts") -> DataFrame:
    """Fold a batch of updates into an SCD2 history table.

    `history` None/empty -> bootstrap from the batch. Multiple versions of
    one key inside the batch are all applied in `ts_col` order.
    """
    keys, attrs = list(keys), list(attrs)
    cols = keys + attrs

    incoming = updates.select(*cols, F.col(ts_col).alias("valid_from"))
    if history is not None:
        # drop no-op updates: identical to the CURRENT version of their key
        current = history.filter(F.col("is_current")).select(
            *[F.col(c).alias(f"__cur_{c}") for c in cols])
        joined = incoming.join(
            F.broadcast(current),
            on=[incoming[k] == current[f"__cur_{k}"] for k in keys],
            how="left")
        changed = joined.filter(
            F.coalesce(
                ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
                    F.struct(*[F.col(f"__cur_{a}") for a in attrs])),
                F.lit(True))
        ).select(*cols, "valid_from")
    else:
        changed = incoming

    base = (history.select(*cols, "valid_from")
            if history is not None else None)
    all_versions = changed if base is None else base.unionByName(changed)
    # versions deduped per (key, valid_from): latest writer wins is undefined,
    # so keep distinct — identical re-applies collapse (idempotence)
    all_versions = all_versions.dropDuplicates(keys + ["valid_from"])

    w = Window.partitionBy(*keys).orderBy("valid_from")
    return all_versions.select(
        *cols, "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time view: the version of each key effective at `ts`."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t)))
