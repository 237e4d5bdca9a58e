"""Relational query surface (SURVEY.md §2.3-2.7 operator coverage).

Each entry exercises one operator family from the reference's inventory,
re-expressed on the synthetic star schema (TESTDATA.md) so the DuckDB oracle
can verify it. The §2 IDs covered are noted per query.

Scale notes are embedded per query; the common ones:
- dim joins (nation/region/supplier) broadcast — no shuffle of the fact;
- aggregations are partial (map-side combine) by construction of groupBy;
- top-k uses TakeOrdered (no global sort materialization);
- window functions shuffle once on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.operators import (
    anti_join,
    conform_schema,
    dedup_first,
    enrich,
    flag_semi_join,
)
from etl_docker_spark.plans._util import RATE, dec, dsum, rate, t

# ---------------------------------------------------------------- q01


def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter + 8-way group agg (A1, F17, P5)."""
    l = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price, disc, tax, qty = (dec("l_extendedprice"), rate("l_discount"),
                             rate("l_tax"), dec("l_quantity"))
    one = F.lit(1).cast(RATE)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------- q02


def q02_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Star join through 4 dims, region-filtered (J1/J2/J7, A1).

    region/nation broadcast; customer->orders->lineitem chain lets AQE pick
    broadcast vs shuffled hash by actual size.
    """
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = enrich(t(spark, sf, "nation"), region,
                    on=[F.col("n_regionkey") == F.col("r_regionkey")], how="inner")
    cust = enrich(t(spark, sf, "customer"), nation,
                  on=[F.col("c_nationkey") == F.col("n_nationkey")], how="inner")
    orders = t(spark, sf, "orders").join(
        cust.select("c_custkey", "n_name"),
        F.col("o_custkey") == F.col("c_custkey"), "inner")
    li = t(spark, sf, "lineitem").join(
        orders.select("o_orderkey", "n_name"),
        F.col("l_orderkey") == F.col("o_orderkey"), "inner")
    price, disc = dec("l_extendedprice"), rate("l_discount")
    one = F.lit(1).cast(RATE)
    return (
        li.groupBy("n_name")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"),
             F.countDistinct("l_orderkey").alias("n_orders"))
    )


Q02_SQL = """
SELECT n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

# ---------------------------------------------------------------- q03


def q03_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Join + agg + deterministic top-k (§2.6 orderBy/limit; TakeOrdered)."""
    price, disc = dec("l_extendedprice"), rate("l_discount")
    one = F.lit(1).cast(RATE)
    rev = (t(spark, sf, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum(price * (one - disc)).alias("rev_dec")))
    return (
        t(spark, sf, "orders")
        .join(rev, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .select("o_orderkey", "o_orderdate", "o_orderpriority",
                F.col("rev_dec").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q03_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------- q04


def q04_priority_with_returns(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-join membership (J6/P5): orders having a returned line."""
    returned = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    flagged = flag_semi_join(
        t(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        returned, on=["l_orderkey"], flag_name="has_return")
    return (flagged.filter(F.col("has_return"))
            .groupBy("o_orderpriority").agg(F.count("*").alias("n_orders")))


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------- q05


def q05_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join (P11): the reference's loop-delete as one left_anti.

    Restricted to pre-1996 orders so the result is NON-EMPTY at every sf —
    an anti-join gate that always returns zero rows would verify nothing.
    """
    cust = t(spark, sf, "customer")
    early = (t(spark, sf, "orders")
             .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
             .withColumnRenamed("o_custkey", "c_custkey"))
    return (anti_join(cust, early, on=["c_custkey"])
            .groupBy("c_mktsegment").agg(F.count("*").alias("n_customers")))


Q05_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate < TIMESTAMP '1996-01-01')
GROUP BY c_mktsegment
"""

# ---------------------------------------------------------------- q06


def q06_discount_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan filter, pushdown-friendly (P5/P6, F14)."""
    l = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec("l_extendedprice") * rate("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q06_SQL = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

# ---------------------------------------------------------------- q07


def q07_latest_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic keep-first dedup (A4 with the §7.3 ordering contract)."""
    latest = dedup_first(
        t(spark, sf, "orders"), keys=["o_custkey"],
        order_by=[F.desc("o_orderdate"), F.desc("o_orderkey")])
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


Q07_SQL = """
SELECT o_custkey,
       o_orderkey  AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       o_totalprice AS latest_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""

# ---------------------------------------------------------------- q08


def q08_part_ship_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Group-max over multiple columns (A2): latest state per key."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.max("l_shipdate").alias("last_ship"),
             F.min("l_shipdate").alias("first_ship"),
             F.max("l_extendedprice").alias("max_price"),
             F.count("*").alias("n_lines"))
    )


Q08_SQL = """
SELECT l_partkey, MAX(l_shipdate) AS last_ship, MIN(l_shipdate) AS first_ship,
       MAX(l_extendedprice) AS max_price, COUNT(*) AS n_lines
FROM lineitem GROUP BY l_partkey
"""

# ---------------------------------------------------------------- q09


def q09_net_quantity_sign(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional sign flip (F15): returns negate, like credit notes."""
    qty = dec("l_quantity")
    price = dec("l_extendedprice")
    signed_qty = F.when(F.col("l_returnflag") == "R", -qty).otherwise(qty)
    signed_price = F.when(F.col("l_returnflag") == "R", -price).otherwise(price)
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_linestatus")
        .agg(F.sum(signed_qty).cast("double").alias("net_qty"),
             F.sum(signed_price).cast("double").alias("net_sales"),
             F.count("*").alias("n_lines"))
    )


Q09_SQL = """
SELECT l_linestatus,
  CAST(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS DECIMAL(12,4)) ELSE CAST(l_quantity AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS net_qty,
  CAST(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(12,4)) ELSE CAST(l_extendedprice AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS net_sales,
  COUNT(*) AS n_lines
FROM lineitem GROUP BY l_linestatus
"""

# ---------------------------------------------------------------- q10


def q10_conform_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-align projection (P2): absent columns appear as typed NULLs."""
    from pyspark.sql import types as T

    target = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("loyalty_tier", T.StringType()),     # absent in source
        T.StructField("signup_ts", T.TimestampType()),     # absent in source
        T.StructField("c_mktsegment", T.StringType()),
    ])
    return conform_schema(t(spark, sf, "customer"), target)


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal,
       CAST(NULL AS VARCHAR) AS loyalty_tier,
       CAST(NULL AS TIMESTAMP) AS signup_ts,
       c_mktsegment
FROM customer
"""

# ---------------------------------------------------------------- q11


def q11_string_surgery(spark: SparkSession, sf: str) -> DataFrame:
    """String ops (F1-F5): split-into, slice, pad, concat_ws, nullif."""
    from etl_docker_spark.functions import empty_to_null, split_into  # noqa: F401

    name_parts = split_into("c_name", "#", 2)
    return t(spark, sf, "customer").select(
        "c_custkey",
        name_parts[1].cast("long").alias("cust_seq"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_label"),
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_or_null"),
    )


Q11_SQL = """
SELECT c_custkey,
       CAST(string_split(c_name, '#')[2] AS BIGINT) AS cust_seq,
       substring(c_name, 1, 8) AS name_prefix,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_label,
       nullif(c_mktsegment, 'MACHINERY') AS seg_or_null
FROM customer
"""

# ---------------------------------------------------------------- q12


def q12_event_daily_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time daily aggregation (F7/F11; batch mirror of a tumbling window)."""
    return (
        t(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             dsum("value").alias("total_value"),
             F.countDistinct("user_id").alias("n_users"))
    )


Q12_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY CAST(ts AS DATE), event_type
"""

# ---------------------------------------------------------------- q13


def q13_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction (F20/F23 analog on JSON strings)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t(spark, sf, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.max("k").alias("max_k"),
             F.count("k").alias("n_with_k"))
    )


Q13_SQL = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k, COUNT(k) AS n_with_k
FROM (SELECT event_type,
             CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""

# ---------------------------------------------------------------- q14


def q14_running_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed running total (§2.6): one shuffle on the partition key."""
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


Q14_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
FROM orders
"""

# ---------------------------------------------------------------- q15


def q15_rollup_totals(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (free in Spark; absent in the reference)."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_lines"))
    )


Q15_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# ---------------------------------------------------------------- q16/q18


def q16_union_nations(spark: SparkSession, sf: str) -> DataFrame:
    """Set op UNION-dedup (U1/A3)."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


Q16_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q18_nation_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """Set op INTERSECT (§2.7 — free in Spark, absent in the reference)."""
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


Q18_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""

# ---------------------------------------------------------------- q17


def q17_pivot_linestatus(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with pinned values (explicit list keeps the plan static)."""
    piv = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_open"),
        F.col("F").cast("double").alias("qty_finished"),
    )


Q17_SQL = """
SELECT l_returnflag,
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS qty_open,
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS qty_finished
FROM lineitem GROUP BY l_returnflag
"""

# ---------------------------------------------------------------- q19


def q19_left_join_default(spark: SparkSession, sf: str) -> DataFrame:
    """Left broadcast enrich with default on miss (J4 `.map` semantics)."""
    seg = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = enrich(t(spark, sf, "orders"), seg,
                    on=[F.col("o_custkey") == F.col("c_custkey")], how="left")
    return (
        joined.select(F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
                      F.col("o_totalprice"))
        .groupBy("segment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
    )


Q19_SQL = """
SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_spend
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
GROUP BY COALESCE(c_mktsegment, 'UNKNOWN')
"""

# ---------------------------------------------------------------- q20


def q20_supplier_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Two-hop chained broadcast enrich (J5): lineitem->supplier->nation."""
    from etl_docker_spark.operators import two_hop_enrich

    li = t(spark, sf, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    out = two_hop_enrich(
        li,
        t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"), ["s_suppkey"],
        t(spark, sf, "nation").select(F.col("n_nationkey").alias("s_nationkey"), "n_name"),
        ["s_nationkey"], how="inner")
    price, disc = dec("l_extendedprice"), rate("l_discount")
    one = F.lit(1).cast(RATE)
    return (out.groupBy("n_name")
            .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


Q20_SQL = """
SELECT n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""

# ---------------------------------------------------------------- q21


def q21_predicate_combo(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate battery (P5/P6/P7): isin, negated conjunction, NOT contains."""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderstatus") != "F")
        & ~F.col("o_orderpriority").contains("SPECIFIED")
        & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderstatus") == "P"))
        & (F.col("o_totalprice") > 50000)
    )
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))


Q21_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total
FROM orders
WHERE o_orderstatus <> 'F'
  AND o_orderpriority NOT LIKE '%SPECIFIED%'
  AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'P')
  AND o_totalprice > 50000
GROUP BY o_orderstatus, o_orderpriority
"""

# ---------------------------------------------------------------- q22


def q22_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization: lag + gap>30min cut + per-user session count.

    Micro-exact: gaps compared in integer microseconds (unix_micros), so the
    boundary semantics are identical in any engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    per_event = t(spark, sf, "events").select(
        "user_id", "event_id", is_new.alias("is_new"))
    return (per_event.groupBy("user_id")
            .agg(F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events")))


Q22_SQL = """
WITH g AS (
  SELECT user_id, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""

RELATIONAL = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_revenue_by_nation": (q02_revenue_by_nation, Q02_SQL),
    "q03_top_orders": (q03_top_orders, Q03_SQL),
    "q04_priority_with_returns": (q04_priority_with_returns, Q04_SQL),
    "q05_customers_without_orders": (q05_customers_without_orders, Q05_SQL),
    "q06_discount_revenue": (q06_discount_revenue, Q06_SQL),
    "q07_latest_order_per_customer": (q07_latest_order_per_customer, Q07_SQL),
    "q08_part_ship_stats": (q08_part_ship_stats, Q08_SQL),
    "q09_net_quantity_sign": (q09_net_quantity_sign, Q09_SQL),
    "q10_conform_projection": (q10_conform_projection, Q10_SQL),
    "q11_string_surgery": (q11_string_surgery, Q11_SQL),
    "q12_event_daily_rollup": (q12_event_daily_rollup, Q12_SQL),
    "q13_json_props": (q13_json_props, Q13_SQL),
    "q14_running_spend": (q14_running_spend, Q14_SQL),
    "q15_rollup_totals": (q15_rollup_totals, Q15_SQL),
    "q16_union_nations": (q16_union_nations, Q16_SQL),
    "q17_pivot_linestatus": (q17_pivot_linestatus, Q17_SQL),
    "q18_nation_intersect": (q18_nation_intersect, Q18_SQL),
    "q19_left_join_default": (q19_left_join_default, Q19_SQL),
    "q20_supplier_nation_revenue": (q20_supplier_nation_revenue, Q20_SQL),
    "q21_predicate_combo": (q21_predicate_combo, Q21_SQL),
    "q22_sessionize": (q22_sessionize, Q22_SQL),
}
