"""Distributed ordered prefix sum — the scalable cumulative-sum shape.

The naive encoding (`SUM(x) OVER (ORDER BY ...)` with no PARTITION BY)
collapses the whole table into ONE window partition: a single task sorts
and scans everything, which is exactly the plan that dies at 100 TB. The
classic two-phase formulation keeps the work parallel:

  1. range-partition by the order keys (so partition i holds a contiguous
     key range, sorted within);
  2. per-partition local running sum (parallel, no cross-talk);
  3. aggregate ONE row per partition (its total), prefix-sum those K rows
     with a strict-less triangle join (K = partitions, so K^2 is tiny and
     constant at any data scale), broadcast the offsets back and add.

Partition boundaries come from range-partitioner sampling and are NOT
deterministic — but the final prefix sum is: it only depends on the total
order, which the boundaries preserve. Used by d18 (token-budget corpus
curation); equivalence with the naive window is property-tested.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum_ordered(df: DataFrame, order_by: Sequence[Column],
                       value_col: str, out_col: str = "cum") -> DataFrame:
    """Running sum of `value_col` over the TOTAL order `order_by`
    (inclusive of the current row), computed without a global single
    partition. `order_by` must be a strict total order (include a unique
    tiebreak column) or results are nondeterministic — same contract as
    any ordered window.
    """
    order_by = list(order_by)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n_parts, *order_by)
              .sortWithinPartitions(*order_by)
              .withColumn("__pid", F.spark_partition_id()))
    # local running sum within each range partition
    w_local = (Window.partitionBy("__pid").orderBy(*order_by)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = ranged.withColumn("__local", F.sum(value_col).over(w_local))
    # one row per partition; running offset over the K tiny rows via a
    # strict-less triangle join (K^2 <= 1024 pairs on a constant-size
    # frame) rather than an unpartitioned window: the window encoding
    # fired Spark's "No Partition Defined" WARN on every run, and the
    # surface-wide invariant "that warning is a REAL alarm" (NOTES r8)
    # is only enforceable if nothing benign emits it. Equivalence is
    # covered by the same property tests.
    totals = (local.groupBy("__pid")
              .agg(F.sum(value_col).alias("__ptotal")))
    prior = totals.select(F.col("__pid").alias("__qid"),
                          F.col("__ptotal").alias("__qtotal"))
    offsets = (totals.join(F.broadcast(prior),
                           F.col("__qid") < F.col("__pid"), "left")
               .groupBy("__pid")
               .agg(F.coalesce(F.sum("__qtotal"), F.lit(0))
                    .alias("__offset")))
    return (local.join(F.broadcast(offsets), "__pid")
            .withColumn(out_col, F.col("__local") + F.col("__offset"))
            .drop("__pid", "__local", "__offset"))
