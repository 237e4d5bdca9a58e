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
    cols = df.columns
    a = df.alias("__a")
    b = df.alias("__b")
    # b strictly-before a: lexicographic on the order spec
    before = F.lit(False)
    eq_prefix = F.lit(True)
    for col, desc in order:
        ac, bc = F.col(f"__a.{col}"), F.col(f"__b.{col}")
        before = before | (eq_prefix & (bc > ac if desc else bc < ac))
        eq_prefix = eq_prefix & (bc == ac)
    probe = order[0][0]  # non-null by contract -> safe count anchor
    return (a.join(F.broadcast(b), before, "left")
            .groupBy(*[F.col(f"__a.{c}").alias(c) for c in cols])
            .agg((F.count(F.col(f"__b.{probe}")) + 1).cast("long")
                 .alias(out_col)))
