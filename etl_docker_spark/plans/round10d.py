"""Round-10 new-probe finds (VERDICT r9 item 7: re-probe the live
surface). Three primitives moved or were confirmed live this round:

- The classic SQL statistics aggregates — mode(), regr_* (least
  squares), percentile_disc/percentile_cont WITHIN GROUP — all execute
  (q103). The oracle recomputes every one of them FROM FIRST
  PRINCIPLES (arg-max over group counts, ordered-selection quantiles,
  closed-form least squares from exact integer sums), so the gate pins
  Spark's native aggregate implementations against an independent
  formulation, not the same function on another engine.
- The TIME type moved ANOTHER half-notch (round 8: literals parse but
  execution-disabled; now: literals, per-row equality/ordering/IN/
  BETWEEN, ORDER BY, and CAST TIME->STRING execute — while CAST
  STRING->TIME, extract(), make_time(), to_time(), time arithmetic,
  from_csv/from_json TIME schemas, and ANY shuffle or aggregate
  carrying a TIME column remain UNSUPPORTED_TIME_TYPE; group-by keys,
  min/max and COUNT(DISTINCT) over TIME all raise). q104 drives the
  live per-row half by constructing TIME through literal-array
  indexing (the one data-driven construction route) and converts to
  STRING before anything shuffles; the dead half is pinned here, like
  q96's grammar pins.
- Recursive CTEs execute (WITH RECURSIVE ... UNION ALL) — the first
  SQL-native iteration in the engine; previously iterative algorithms
  (g01-g07) needed driver-side loops. g08 computes bounded functional-
  graph reachability recursively on Spark and gates it against an
  UNROLLED non-recursive oracle (six explicit join levels), so the
  brand-new recursive executor is checked against a formulation that
  does not share it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_docker_spark.plans._util import t

ROUND10D: dict = {}

# ---------------------------------------------------------------- q103

# Exact-arithmetic design: x = l_quantity (integers 1..50), y = k*x + 7
# with k = ascii(returnflag) % 5 + 1 (collinear per group, slope/
# intercept/r2 known exactly); engine FP noise (streaming covariance vs
# exact sums) is absorbed by ppm rounding, values sit ~1e6 from any
# rounding boundary. mode input least(x, 20) has a unique strict
# majority (x >= 20 collapses), so tie semantics never matter.
_Q103_SPARK = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)                                AS n_rows,
       CAST(mode(least(x, 20)) AS BIGINT)                      AS mode_v,
       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY xd) AS DOUBLE)
                                                               AS p25,
       CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY xd) AS DOUBLE)
                                                               AS p50,
       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY xd) AS DOUBLE)
                                                               AS p75,
       CAST(round(percentile_cont(0.50) WITHIN GROUP (ORDER BY xd)
                  * 100) AS BIGINT)                            AS pc50_c,
       CAST(round(regr_slope(yd, xd) * 1000000) AS BIGINT)  AS slope_ppm,
       CAST(round(regr_intercept(yd, xd) * 1000000) AS BIGINT)
                                                            AS icept_ppm,
       CAST(round(regr_r2(yd, xd) * 1000000) AS BIGINT)       AS r2_ppm,
       CAST(regr_count(yd, xd) AS BIGINT)                     AS regr_n
FROM (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS xd,
         CAST((ascii(l_returnflag) % 5 + 1) * CAST(l_quantity AS BIGINT)
              + 7 AS DOUBLE) AS yd
  FROM {LINEITEM}
)
GROUP BY l_returnflag
"""


def q103_stats_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Native statistics-aggregate battery: mode(), percentile_disc x3
    + percentile_cont WITHIN GROUP, and the regr_* least-squares family
    — all newly confirmed live this round. The ORACLE does not call any
    of these functions: mode is an arg-max over (value, count) with a
    deterministic tie-break the data never exercises, the quantiles
    are ordered-selection (first value at cumulative fraction >= p;
    midpoint average for the continuous median), and the regression is
    closed-form least squares from exact BIGINT power sums — so the
    gate checks Spark's implementations against independent math.

    Scale shape: one pass over lineitem, 3-group aggregate; the
    WITHIN GROUP quantiles sort per-group inside the aggregate (at
    cluster scale the group count is the parallelism bound — here 3
    groups, the battery's point is semantics, not the sort).
    """
    name = f"q103_li_{abs(hash(sf)) % 10 ** 8}"
    t(spark, sf, "lineitem").createOrReplaceTempView(name)
    return spark.sql(_Q103_SPARK.replace("{LINEITEM}", name))


Q103_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         (CAST(ascii(l_returnflag) AS BIGINT) % 5 + 1)
           * CAST(l_quantity AS BIGINT) + 7 AS y
  FROM lineitem
),
-- mode from first principles: arg-max of per-value counts
mode_t AS (
  SELECT l_returnflag, v AS mode_v FROM (
    SELECT l_returnflag, v, row_number() OVER (
             PARTITION BY l_returnflag ORDER BY cnt DESC, v ASC) AS rn
    FROM (SELECT l_returnflag, least(x, 20) AS v, COUNT(*) AS cnt
          FROM base GROUP BY 1, 2)
  ) WHERE rn = 1
),
-- quantiles from first principles: ordered selection over (rn, n)
ranked AS (
  SELECT l_returnflag, x,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM base
),
quant AS (
  SELECT l_returnflag,
         CAST(MIN(CASE WHEN rn >= CAST(ceil(0.25 * n) AS BIGINT)
                  THEN x END) AS DOUBLE) AS p25,
         CAST(MIN(CASE WHEN rn >= CAST(ceil(0.50 * n) AS BIGINT)
                  THEN x END) AS DOUBLE) AS p50,
         CAST(MIN(CASE WHEN rn >= CAST(ceil(0.75 * n) AS BIGINT)
                  THEN x END) AS DOUBLE) AS p75,
         -- continuous median: midpoint of the two middle order stats
         CAST(round((MIN(CASE WHEN rn = (n + 1) // 2 THEN x END)
                     + MIN(CASE WHEN rn = n // 2 + 1 THEN x END))
                    / 2.0 * 100) AS BIGINT) AS pc50_c
  FROM ranked GROUP BY l_returnflag
),
-- least squares from exact integer power sums
sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM base GROUP BY l_returnflag
),
regr AS (
  SELECT l_returnflag,
         CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000)
              AS BIGINT) AS slope_ppm,
         CAST(round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy
                      AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                    * 1000000) AS BIGINT) AS icept_ppm,
         1000000 AS r2_ppm,  -- exactly collinear by construction
         CAST(n AS BIGINT) AS regr_n
  FROM sums
)
SELECT s.l_returnflag,
       CAST(s.n AS BIGINT) AS n_rows,
       CAST(m.mode_v AS BIGINT) AS mode_v,
       q.p25, q.p50, q.p75, q.pc50_c,
       r.slope_ppm, r.icept_ppm, CAST(r.r2_ppm AS BIGINT) AS r2_ppm,
       r.regr_n
FROM sums s
JOIN mode_t m USING (l_returnflag)
JOIN quant q USING (l_returnflag)
JOIN regr r USING (l_returnflag)
"""

ROUND10D.update({
    "q103_stats_battery": (q103_stats_battery, Q103_SQL),
})

# ---------------------------------------------------------------- q104

_Q104_HOURS = "array(" + ", ".join(
    f"TIME '{h:02d}:00:00'" for h in range(24)) + ")"
_Q104_QUARTERS = ("array(TIME '00:00:00', TIME '00:15:00', "
                  "TIME '00:30:00', TIME '00:45:00')")


def q104_time_battery(spark: SparkSession, sf: str) -> DataFrame:
    """TIME-type battery over everything that EXECUTES in this build.
    The live surface is EXPRESSION-LEVEL ONLY: literals, literal-array
    indexing (the one data-driven construction route), per-row ordering
    comparisons (<, BETWEEN, CASE laddering), equality/IN membership,
    ORDER BY, and CAST(TIME AS STRING). Still execution-disabled and
    therefore NOT in this query: CAST(STRING AS TIME), make_time,
    to_time, extract, time arithmetic — and, the big one, any SHUFFLE
    or AGGREGATE carrying a TIME column (group-by keys, min/max,
    COUNT(DISTINCT) on TIME all raise UNSUPPORTED_TIME_TYPE), so every
    TIME value here is consumed per-row and the shuffle carries
    strings. The oracle constructs the same times with DuckDB's
    make_time() — a route Spark lacks — so agreement pins the literal
    encoding and comparator semantics, not a shared code path.

    Scale shape: all TIME work is folded into the scan projection
    (whole-stage codegen, zero extra passes); one 4-group string agg.
    """
    from pyspark.sql import functions as F

    ev = t(spark, sf, "events").select(
        F.expr(f"element_at({_Q104_HOURS}, "
               f"CAST(hour(ts) AS INT) + 1)").alias("ht"),
        F.expr(f"element_at({_Q104_QUARTERS}, "
               f"CAST(minute(ts) div 15 AS INT) + 1)").alias("qt"))
    row = ev.select(
        # per-row TIME ordering ladder
        F.expr("CASE WHEN ht < TIME '06:00:00' THEN 'night' "
               "WHEN ht < TIME '12:00:00' THEN 'morning' "
               "WHEN ht < TIME '18:00:00' THEN 'afternoon' "
               "ELSE 'evening' END").alias("shift"),
        # per-row TIME equality / IN membership
        F.expr("ht IN (TIME '09:00:00', TIME '12:00:00', "
               "TIME '17:00:00')").alias("is_peak"),
        # per-row BETWEEN over TIME
        F.expr("qt BETWEEN TIME '00:15:00' AND TIME '00:30:00'")
        .alias("mid_quarter"),
        # TIME leaves the row as STRING so the shuffle never carries it
        F.expr("CAST(ht AS STRING)").alias("hs"),
        F.expr("CAST(qt AS STRING)").alias("qs"))
    return (row.groupBy("shift")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(F.when(F.col("is_peak"), 1).otherwise(0))
                 .cast("long").alias("n_peak"),
                 F.sum(F.when(F.col("mid_quarter"), 1).otherwise(0))
                 .cast("long").alias("n_mid_quarter"),
                 F.countDistinct("hs").cast("long").alias("n_hours"),
                 F.countDistinct("qs").cast("long").alias("n_quarters"),
                 F.min("hs").alias("first_hour"),
                 F.max("hs").alias("last_hour")))


Q104_SQL = """
WITH ev AS (
  SELECT make_time(CAST(hour(ts) AS BIGINT), 0, 0.0) AS ht,
         make_time(0, CAST(minute(ts) // 15 * 15 AS BIGINT), 0.0) AS qt
  FROM events
),
row_t AS (
  SELECT CASE WHEN ht < TIME '06:00:00' THEN 'night'
              WHEN ht < TIME '12:00:00' THEN 'morning'
              WHEN ht < TIME '18:00:00' THEN 'afternoon'
              ELSE 'evening' END AS shift,
         ht IN (TIME '09:00:00', TIME '12:00:00', TIME '17:00:00')
           AS is_peak,
         qt BETWEEN TIME '00:15:00' AND TIME '00:30:00' AS mid_quarter,
         CAST(ht AS VARCHAR) AS hs,
         CAST(qt AS VARCHAR) AS qs
  FROM ev
)
SELECT shift,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN is_peak THEN 1 ELSE 0 END) AS BIGINT)
         AS n_peak,
       CAST(SUM(CASE WHEN mid_quarter THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mid_quarter,
       CAST(COUNT(DISTINCT hs) AS BIGINT) AS n_hours,
       CAST(COUNT(DISTINCT qs) AS BIGINT) AS n_quarters,
       MIN(hs) AS first_hour,
       MAX(hs) AS last_hour
FROM row_t
GROUP BY shift
"""

ROUND10D.update({
    "q104_time_battery": (q104_time_battery, Q104_SQL),
})

# ---------------------------------------------------------------- g08

_G08_DEPTH = 6

# shared arithmetic: functional graph on the customer key domain,
# dst = (31 * src + 17) mod N — out-degree exactly 1, so the frontier
# is N rows at EVERY depth (bounded state, no fan-out blowup)
_G08_EDGES = ("SELECT CAST(c_custkey AS BIGINT) AS src, "
              "(31 * CAST(c_custkey AS BIGINT) + 17) "
              "% (SELECT COUNT(*) FROM {CUST}) AS dst FROM {CUST}")

_G08_SPARK = """
WITH RECURSIVE edges AS (
  {EDGES}
), reach(src, node, depth) AS (
  SELECT src, src AS node, 0 AS depth FROM edges
  UNION ALL
  SELECT r.src, e.dst AS node, r.depth + 1 AS depth
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.depth < {DEPTH}
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct,
       CAST(SUM(node) AS BIGINT) AS sum_node
FROM reach GROUP BY depth
"""


def g08_recursive_reachability(spark: SparkSession,
                               sf: str) -> DataFrame:
    """Bounded reachability over a functional graph via WITH RECURSIVE
    — SQL-native iteration, newly live this round (g01-g07 loop on the
    driver). Out-degree is exactly 1 by construction, so every depth's
    frontier is |V| rows: the recursion's working set is bounded and
    each step is one equi-join, the shape that survives scale (a
    fan-out graph would need the g07-style frontier-dedup loop
    instead). The edges derivation (including its scalar COUNT(*)
    modulus subquery) is hoisted into a non-recursive named CTE so the
    recursive term references it instead of re-deriving it per step
    (r10 ADVICE). The ORACLE unrolls the recursion into six explicit
    join levels — no WITH RECURSIVE — so Spark's brand-new recursive
    executor is gated against a formulation that does not share it.
    """
    name = f"g08_cust_{abs(hash(sf)) % 10 ** 8}"
    t(spark, sf, "customer").createOrReplaceTempView(name)
    sql = (_G08_SPARK
           .replace("{EDGES}", _G08_EDGES.replace("{CUST}", name))
           .replace("{DEPTH}", str(_G08_DEPTH)))
    return spark.sql(sql)


def _g08_unrolled_oracle() -> str:
    edges = _G08_EDGES.replace("{CUST}", "customer")
    levels = ["SELECT src, src AS node, 0 AS depth FROM edges"]
    for d in range(1, _G08_DEPTH + 1):
        levels.append(
            f"SELECT r.src, e.dst AS node, {d} AS depth "
            f"FROM lvl{d - 1} r JOIN edges e ON r.node = e.src")
    ctes = ["edges AS (" + edges + ")"]
    ctes += [f"lvl{d} AS ({q})" for d, q in enumerate(levels)]
    union = " UNION ALL ".join(
        f"SELECT * FROM lvl{d}" for d in range(_G08_DEPTH + 1))
    return (
        "WITH " + ", ".join(ctes) + ", reach AS (" + union + ") "
        "SELECT CAST(depth AS BIGINT) AS depth, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct, "
        "CAST(SUM(node) AS BIGINT) AS sum_node "
        "FROM reach GROUP BY depth")


G08_SQL = _g08_unrolled_oracle()

ROUND10D.update({
    "g08_recursive_reachability": (g08_recursive_reachability, G08_SQL),
})
