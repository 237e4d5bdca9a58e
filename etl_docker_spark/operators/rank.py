"""Rank over a BOUNDED frame without an unpartitioned window.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY always plans an
unpartitioned WindowExec — fine on the k-row frames the top-k queries
feed it (a LIMIT-k result, a vocabulary aggregate), but Spark emits the
"No Partition Defined" WARN for every such node, and the surface-wide
invariant "that warning is a REAL alarm for data-sized frames" (NOTES
r8/r9) is only enforceable if nothing benign emits it. For a frame that
is constant-size by construction, rank has a join encoding with no
window at all:

    rank(a) = 1 + |{b : b strictly-before a}|

computed as a broadcast strict-before self-join + count aggregate (the
same K-row triangle idea as operators/prefix.py's offset merge). O(k^2)
comparisons — ONLY for frames bounded by construction (LIMIT-k results,
charset/vocabulary aggregates), never data-sized input.

With a strict total order (callers must include a unique tiebreak, same
contract as row_number) rank == row_number exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_bounded(df: DataFrame, order: Sequence[tuple[str, bool]],
                 out_col: str = "rank") -> DataFrame:
    """Append `out_col` = row_number under `order` ([(col, desc?)], a
    strict total order over NON-NULL columns) to the bounded frame `df`.

    Output column set is df.columns + [out_col]; row order is not
    defined (as with any DataFrame).
    """
    order = list(order)
    if not order:
        raise ValueError("rank_bounded: order must name at least one "
                         "column (a strict total order is the contract)")
    missing = [c for c, _ in order if c not in df.columns]
    if missing:
        raise ValueError(f"rank_bounded: order columns not in frame: "
                         f"{missing}")
    cols = df.columns
    a = df.alias("__a")
    # count a constant marker, not an order column, so match counting
    # never depends on the non-null contract
    b = df.withColumn("__one", F.lit(1)).alias("__b")
    # b strictly-before a: lexicographic on the order spec
    before = F.lit(False)
    eq_prefix = F.lit(True)
    for col, desc in order:
        ac, bc = F.col(f"__a.{col}"), F.col(f"__b.{col}")
        before = before | (eq_prefix & (bc > ac if desc else bc < ac))
        eq_prefix = eq_prefix & (bc == ac)
    counted = (a.join(F.broadcast(b), before, "left")
               .groupBy(*[F.col(f"__a.{c}").alias(c) for c in cols])
               .agg(F.count(F.col("__b.__one")).alias("__cnt")))
    # NULL in an order column makes strictly-before evaluate to NULL and
    # would silently deflate (and possibly duplicate) ranks — fail loudly
    # instead. assert_true is folded INTO the output expression so
    # Catalyst cannot prune it; constant cost on the k-row frames this
    # operator is for.
    guard = F.lit(True)
    for col, _ in order:
        guard = guard & F.col(col).isNotNull()
    checked = F.assert_true(
        guard, F.lit("rank_bounded: NULL in an order column violates "
                     "the strict-total-order contract"))
    return counted.select(
        *cols,
        F.when(checked.isNull(), F.col("__cnt") + 1).cast("long")
        .alias(out_col))
