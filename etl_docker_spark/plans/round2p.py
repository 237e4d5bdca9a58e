"""Round-2 sixteenth batch: the Spark 4 SQL-surface features — recursive
CTEs and the VARIANT type.

- g03: bounded-hop BFS distances over the mutual top-K co-trade graph via
  WITH RECURSIVE — the recursive-CTE surface Spark 4 added, exercised
  with the SAME SQL text on both engines. Spark's recursion supports only
  UNION ALL, so the query is the depth-guarded BFS form (min-hop distance
  within L hops, final aggregate dedups paths); path multiplicity stays
  bounded because the graph's degree is capped at K by construction
  (g02's scale argument doing double duty).
- q56: VARIANT semi-structured shredding — events.props parsed with
  parse_json and extracted with variant_get (the Spark 4 binary
  semi-structured type, a different engine path from q13's string
  get_json_object), aggregated per extracted-value bucket.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dsum, t

# ---------------------------------------------------------------- g03

_G03_MAX_HOPS = 4
_G03_SEEDS = 10  # seed suppliers: s_suppkey < 10

# recursion body shared verbatim by both engines: depth-guarded UNION ALL
# BFS; min(depth) per (seed, node) is the true hop distance because every
# shortest path is among the enumerated ones
_G03_RECURSION = f"""
reach (seed, node, depth) AS (
  SELECT a AS seed, b AS node, 1 AS depth FROM {{edges}} WHERE a < {_G03_SEEDS}
  UNION ALL
  SELECT r.seed, e.b AS node, r.depth + 1
  FROM reach r JOIN {{edges}} e ON e.a = r.node
  WHERE r.depth < {_G03_MAX_HOPS}
)
SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS min_hops
FROM reach WHERE node <> seed
GROUP BY seed, node
"""


def _g02_edges(spark: SparkSession, sf: str) -> DataFrame:
    """g02's memoized mutual top-K co-trade edge set, as BOTH directions
    so the recursion walks undirected edges."""
    from etl_docker_spark.plans.round2j import cotrade_edges

    und = cotrade_edges(spark, sf)
    return und.unionAll(und.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))


def g03_hop_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Min-hop BFS distance (<= 4 hops) from low-id seed suppliers over
    the mutual co-trade graph, via Spark 4's WITH RECURSIVE.

    The edge set is materialized once (checkpoint; K*N rows of two longs)
    and the recursion is pure SQL over it — the same recursion text the
    DuckDB oracle runs. Path multiplicity per seed is bounded by K^hops
    (degree-capped graph), so UNION ALL recursion stays small; the
    per-(seed, node) MIN collapses paths to distances. Iterative
    DataFrame loops (g01's form) remain the choice when per-round
    re-aggregation or convergence tests are needed; this surface covers
    the declarative-recursion idiom.
    """
    _g02_edges(spark, sf).localCheckpoint().createOrReplaceTempView(
        "g03_edges")
    return spark.sql("WITH RECURSIVE "
                     + _G03_RECURSION.format(edges="g03_edges"))


def _g03_sql() -> str:
    from etl_docker_spark.plans.round2j import G02_SQL

    edge_ctes = G02_SQL.strip().removeprefix("WITH").rsplit(
        "tri AS (", 1)[0].strip().rstrip(",")
    return f"""
WITH RECURSIVE {edge_ctes},
und AS (
  SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
),
{_G03_RECURSION.format(edges="und")}
"""


# ---------------------------------------------------------------- q56


def q56_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """Shred events.props through the VARIANT type: parse_json once,
    variant_get the typed field, aggregate per value decile bucket.

    VARIANT is Spark 4's binary semi-structured representation — parsing
    happens once per row into a navigable value (the engine path Delta
    shredding builds on), vs q13's per-extraction string walk. The gate
    pins that the typed extraction agrees with the oracle's JSON path
    arithmetic exactly.
    """
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    ev = t(spark, sf, "events").select(
        "event_type", "value", k.alias("k"))
    return (ev.withColumn("k_bucket", F.expr("k div 10"))
            .groupBy("event_type", "k_bucket")
            .agg(F.count("*").alias("n_events"),
                 F.min("k").alias("min_k"), F.max("k").alias("max_k"),
                 dsum("value").alias("total_value")))


Q56_SQL = """
SELECT event_type,
       CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) // 10
         AS k_bucket,
       COUNT(*) AS n_events,
       MIN(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT))
         AS min_k,
       MAX(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT))
         AS max_k,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM events
GROUP BY 1, 2
"""


ROUND2P = {
    "g03_hop_distance": (g03_hop_distance, _g03_sql()),
    "q56_variant_shred": (q56_variant_shred, Q56_SQL),
}
