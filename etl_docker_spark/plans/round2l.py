"""Round-2 twelfth batch: the last two classic TPC-H shapes and a
streaming top-k.

- q52: TPC-H Q18 shape (large-volume orders) — grouped HAVING on the fact
  re-joined to its dimensions; the "find the whales, then show their
  details" idiom.
- q53: TPC-H Q14 shape (promo revenue share) — conditional-aggregate
  share by ship month in exact ppm fixed point (q49's integer
  discipline).
- s10: top-k through the streaming engine — tumbling daily counts by
  event type maintained as streaming state (complete mode), ranked top-3
  per window at serving time. The lambda-architecture-free pattern: the
  stream keeps the aggregate, the cheap rank runs on read.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dsum, stream_state_partitions, t
from etl_docker_spark.plans.round2j import _REV_I4

# ---------------------------------------------------------------- q52

_Q52_MIN_QTY = 150


def q52_big_volume_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150, with
    customer and order detail.

    Plan shape: the HAVING aggregate runs on the narrowest possible
    projection (orderkey, quantity) with map-side partial sums; the
    surviving whale keys (a tiny set) re-join orders, and THAT small
    result joins customer — at 100 TB the whale set rides broadcast
    joins, so neither dimension is shuffled. Quantity sums stay
    DECIMAL(12,4) end to end (order-insensitive exact), surfacing as
    DOUBLE only in the result.
    """
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    whales = (li.groupBy("l_orderkey")
              .agg(F.sum(F.col("l_quantity").cast("decimal(12,4)"))
                   .alias("qty_dec"))
              .filter(F.col("qty_dec") > _Q52_MIN_QTY))
    orders = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = t(spark, sf, "customer").select("c_custkey", "c_name")
    return (orders.join(whales, orders.o_orderkey == whales.l_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    "o_totalprice",
                    F.col("qty_dec").cast("double").alias("total_qty")))


Q52_SQL = f"""
WITH whales AS (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > {_Q52_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(qty_dec AS VARCHAR) AS DOUBLE) AS total_qty
FROM whales
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

# ---------------------------------------------------------------- q53


def q53_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of revenue by ship month, in
    exact ppm (integer fixed point, q49's discipline — engine decimal
    division never runs).

    Plan shape: part is a broadcast dim carrying only (key, is-promo);
    one map-side-combined aggregate per month over the joined fact; the
    ppm division happens on 12 rows.
    """
    part = t(spark, sf, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo"))
    li = (t(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("2000-01-01"))
                  & (F.col("l_shipdate") < F.lit("2001-01-01")))
          .select("l_partkey", "l_shipdate",
                  F.expr(_REV_I4.format(p="l_extendedprice", d="l_discount",
                                        div="div")).alias("rev_i4")))
    agg = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
           .agg(F.sum(F.when(F.col("is_promo"), F.col("rev_i4"))
                      .otherwise(F.lit(0))).alias("promo_rev_i4"),
                F.sum("rev_i4").alias("total_rev_i4")))
    return agg.select(
        "ship_month", "promo_rev_i4", "total_rev_i4",
        F.expr("(CAST(promo_rev_i4 AS DECIMAL(38,0)) * 1000000)"
               " div total_rev_i4").alias("promo_ppm"))


Q53_SQL = f"""
WITH j AS (
  SELECT month(l_shipdate) AS ship_month,
         p_type = 'PROMO' AS is_promo,
         {_REV_I4.format(p="l_extendedprice", d="l_discount", div="//")}
           AS rev_i4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    AND l_shipdate <  TIMESTAMP '2001-01-01'
),
agg AS (
  SELECT CAST(ship_month AS BIGINT) AS ship_month,
         SUM(CASE WHEN is_promo THEN rev_i4 ELSE 0 END) AS promo_rev_i4,
         SUM(rev_i4) AS total_rev_i4
  FROM j GROUP BY 1
)
SELECT ship_month, CAST(promo_rev_i4 AS BIGINT) AS promo_rev_i4,
       CAST(total_rev_i4 AS BIGINT) AS total_rev_i4,
       CAST((CAST(promo_rev_i4 AS HUGEINT) * 1000000)
            // CAST(total_rev_i4 AS HUGEINT) AS BIGINT) AS promo_ppm
FROM agg
"""

# ---------------------------------------------------------------- s10

_S10_TOPK = 3


def s10_stream_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 event types per day, maintained THROUGH the streaming engine.

    The daily (window, event_type) counts are streaming state (complete
    mode, exactly the aggregate s01 proves); the top-k rank is applied to
    the sink table at read time — ranking is not a streaming-state
    operation (a rank flips retroactively when counts move), so the
    serving layer does it over the k*windows-row aggregate, not the
    event stream. The oracle is the batch answer: equality proves the
    stream's counts AND the serving rank together.
    """
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)
    from etl_docker_spark.streaming import tumbling_aggregate

    stream = _events_stream(spark, sf)
    agg = tumbling_aggregate(
        stream, "1 day", {"n_events": F.count("*")},
        keys=["event_type"], watermark="1 minute")
    name = f"s10_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    sink = spark.table(name)
    w = Window.partitionBy("window_start").orderBy(F.desc("n_events"),
                                                   F.asc("event_type"))
    return (sink.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _S10_TOPK))


S10_SQL = f"""
WITH counts AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
         CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
           AS window_end,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
)
SELECT window_start, window_end, event_type, n_events,
       CAST(row_number() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type)
            AS BIGINT) AS rank
FROM counts
QUALIFY rank <= {_S10_TOPK}
"""


ROUND2L = {
    "q52_big_volume_orders": (q52_big_volume_orders, Q52_SQL),
    "q53_promo_share": (q53_promo_share, Q53_SQL),
    "s10_stream_topk": (s10_stream_topk, S10_SQL),
}
