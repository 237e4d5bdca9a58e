"""As-of (backward) join — a beyond-reference temporal operator.

Spark has no native ASOF JOIN; the classic scalable encoding is
union + window:

  1. tag left rows _side=1, right rows _side=0;
  2. union on (keys, ts, _side, value columns — null on the left);
  3. per key, ordered by (ts, _side, tiebreak), running `last(value,
     ignorenulls)` carries the most recent right value forward;
  4. keep only left rows.

Cost: ONE shuffle on the keys (the window), no cartesian pair blowup, no
Python. Equal timestamps match (right sorts before left at the same ts),
mirroring `ON l.ts >= r.ts` ASOF semantics. Rights must be unique per
(keys, ts) — pre-dedup with an explicit winner, or the carried value is
nondeterministic (same caveat as any ASOF engine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, on: Sequence[str],
                       left_ts: str, right_ts: str,
                       value_cols: Sequence[str]) -> DataFrame:
    """For each left row, attach the `value_cols` of the latest right row
    with right_ts <= left_ts within the same `on` key group (NULLs if none).
    """
    on = list(on)
    left_cols = [c for c in left.columns]

    l = left.withColumn("__side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    l = l.withColumn("__ts", F.col(left_ts))

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__side", F.lit(0))
    for c in left_cols:
        if c not in set(on) and c not in value_cols:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    all_cols = on + ["__ts", "__side"] + \
        [c for c in left_cols if c not in set(on)] + list(value_cols)
    u = l.select(*all_cols).unionByName(r.select(*all_cols))

    w = (Window.partitionBy(*on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side", "__ts")
