"""Extended relational surface: operator families Spark gives for free that
round out the engine beyond SURVEY.md §2 (the reference has no grouping sets,
ordered string-agg, quantiles, range joins, or multi-distinct aggregation —
SURVEY.md §2.5 notes Spark provides them "if we expose a query surface";
this module is that surface).

Cross-engine determinism notes per query; the shared recipes live in
plans/_util.py (decimal-exact sums, BIGINT pinning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dec, t

# ---------------------------------------------------------------- q27


def q27_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS in one pass: (flag, status), (flag), () — Spark expands
    once and partial-aggregates each set map-side; at 100 TB this is one scan
    instead of three. Grouping flags are surfaced explicitly (INT) because
    NULL group keys are ambiguous with NULL data."""
    l = t(spark, sf, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


Q27_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""

# ---------------------------------------------------------------- q28


def q28_ordered_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): member roster per nation.

    collect_list has no deterministic order in a distributed engine, so the
    contract is sort-then-join — array_sort pins the order after collection
    (binary UTF8, same as DuckDB's ORDER BY on VARCHAR). The dim join
    broadcasts; the agg shuffles names once, grouped by nation.
    """
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    joined = cust.join(F.broadcast(nation),
                       F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.groupBy("n_name")
        .agg(
            F.count("*").alias("n_members"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|")
            .alias("roster"),
        )
    )


Q28_SQL = """
SELECT n_name, COUNT(*) AS n_members,
       string_agg(c_name, '|' ORDER BY c_name) AS roster
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

# ---------------------------------------------------------------- q29


def q29_quantile_spread(spark: SparkSession, sf: str) -> DataFrame:
    """Exact quantiles (percentile_cont semantics) per group.

    Parity is exact here, not approximate: l_quantity holds integral doubles
    and quartile interpolation fractions are quarters (k/4), so
    lower + (upper-lower)*frac is exactly representable — Spark's
    `percentile` and DuckDB's `quantile_cont` agree bit-for-bit. At scale
    swap in approx_percentile and drop the oracle; the exact form is the
    correctness anchor.
    """
    l = t(spark, sf, "lineitem")
    q = F.col("l_quantity")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.min(q).alias("q_min"),
            F.percentile(q, F.lit(0.25)).alias("q25"),
            F.percentile(q, F.lit(0.5)).alias("q50"),
            F.percentile(q, F.lit(0.75)).alias("q75"),
            F.max(q).alias("q_max"),
            F.count("*").alias("n_rows"),
        )
    )


Q29_SQL = """
SELECT l_returnflag,
       MIN(l_quantity) AS q_min,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       MAX(l_quantity) AS q_max,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------- q30


def q30_time_proximity_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: pairs of events by the same user within 60 s.

    Naive form is an O(N^2) theta-join. Scale path: quantize time into
    60 s buckets, explode the LEFT side into (bucket, bucket+1) — every
    qualifying pair shares exactly one (user, bucket) key — then equi-join
    and post-filter the exact time predicate. The shuffle cost tracks
    events-per-user-minute, not N^2. Same-timestamp pairs are ordered by
    event_id so each unordered pair appears once.
    """
    ev = t(spark, sf, "events").select(
        "user_id", F.col("event_id"), F.unix_micros("ts").alias("us"))
    window_us = 60_000_000
    left = ev.select(
        "user_id",
        F.col("event_id").alias("event_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(
            (F.col("us") / window_us).cast("long"),
            (F.col("us") / window_us).cast("long") + 1,
        )).alias("bucket"),
    )
    right = ev.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("us").alias("us_b"),
        (F.col("us") / window_us).cast("long").alias("bucket"),
    )
    return (
        left.join(right, ["user_id", "bucket"])
        .filter(
            (F.col("us_b") - F.col("us_a")).between(0, window_us)
            & ((F.col("us_a") < F.col("us_b"))
               | ((F.col("us_a") == F.col("us_b"))
                  & (F.col("event_a") < F.col("event_b"))))
        )
        .select("user_id", "event_a", "event_b",
                (F.col("us_b") - F.col("us_a")).alias("delta_us"))
    )


Q30_SQL = """
SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 60000000
 AND (epoch_us(a.ts) < epoch_us(b.ts)
      OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
"""

# ---------------------------------------------------------------- q31


def q31_multi_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Several COUNT(DISTINCT) in one aggregation + conditional sums.

    Spark plans multi-distinct via Expand (one row per distinct clause) with
    partial aggregation — a single scan and one shuffle, where the reference
    would run one pandas pass per metric. The filtered sum follows the
    decimal-exact recipe; an empty match set yields NULL in both engines.
    """
    o = t(spark, sf, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(month).alias("n_months"),
            F.sum(F.when(F.col("o_orderstatus") == "F",
                         dec("o_totalprice"))).cast("double")
            .alias("finished_total"),
            F.count("*").alias("n_orders"),
        )
    )


Q31_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
       CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(o_totalprice AS DECIMAL(12,4)) END)
                 AS VARCHAR) AS DOUBLE) AS finished_total,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""

EXTENDED = {
    "q27_grouping_sets": (q27_grouping_sets, Q27_SQL),
    "q28_ordered_listagg": (q28_ordered_listagg, Q28_SQL),
    "q29_quantile_spread": (q29_quantile_spread, Q29_SQL),
    "q30_time_proximity_join": (q30_time_proximity_join, Q30_SQL),
    "q31_multi_distinct": (q31_multi_distinct, Q31_SQL),
}
