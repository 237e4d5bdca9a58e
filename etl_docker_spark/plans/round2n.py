"""Round-2 fourteenth batch: the TPC-H Q2 decorrelation shape.

- q54: per-part minimum-cost supplier via a CORRELATED aggregate subquery
  in the SQL surface — Catalyst decorrelates the per-part MIN into one
  aggregate + join instead of a per-row re-execution (the optimizer
  pattern Q2 exists to test; q32 covers the scalar-AVG variant, this adds
  the argmin-equality form whose result keeps TIES).

Determinism discipline as everywhere: the per-(part, supplier) average
price is scale-4 integer fixed point with integral division, so the MIN
and the equality compare are exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_docker_spark.plans._util import t

_Q54_PS = """
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                         AS BIGINT)) {div} COUNT(*) AS BIGINT) AS avg_price_i4,
           COUNT(*) AS n_lines
    FROM {src} GROUP BY l_partkey, l_suppkey
"""


def q54_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for every part supplied by >= 2 suppliers, the
    supplier(s) with the minimum average sale price (ties kept, as Q2
    keeps them).

    Runs through spark.sql so the correlated `= (SELECT MIN ...)` is
    decorrelated by Catalyst into a broadcast-joined per-part aggregate —
    one pass over the (part, supplier) frame, no per-row subquery. The
    multi-supplier restriction is a windowless COUNT(DISTINCT) via a
    grouped HAVING on the same frame.
    """
    t(spark, sf, "lineitem").createOrReplaceTempView("q54_lineitem")
    ps = _Q54_PS.format(div="div", src="q54_lineitem")
    return spark.sql(f"""
        WITH ps AS ({ps}),
        multi AS (
          SELECT l_partkey FROM ps GROUP BY l_partkey HAVING COUNT(*) >= 2
        )
        SELECT ps.l_partkey, ps.l_suppkey, ps.avg_price_i4, ps.n_lines
        FROM ps JOIN multi ON ps.l_partkey = multi.l_partkey
        WHERE ps.avg_price_i4 = (
            SELECT MIN(ps2.avg_price_i4) FROM ps ps2
            WHERE ps2.l_partkey = ps.l_partkey)
    """)


Q54_SQL = f"""
WITH ps AS ({_Q54_PS.format(div="//", src="lineitem")}),
multi AS (
  SELECT l_partkey FROM ps GROUP BY l_partkey HAVING COUNT(*) >= 2
)
SELECT ps.l_partkey, ps.l_suppkey, ps.avg_price_i4, ps.n_lines
FROM ps JOIN multi ON ps.l_partkey = multi.l_partkey
WHERE ps.avg_price_i4 = (
    SELECT MIN(ps2.avg_price_i4) FROM ps ps2
    WHERE ps2.l_partkey = ps.l_partkey)
"""


ROUND2N = {
    "q54_min_cost_supplier": (q54_min_cost_supplier, Q54_SQL),
}
