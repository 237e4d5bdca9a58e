"""Round-2 fifth batch: time-range window frames, the salting operator
under the oracle gate, an iterative graph algorithm (PageRank), and
CCNet-style perplexity bucketing.

- q40: RANGE-frame windows (interval trailing aggregates) — the one window
  frame family the battery (q26) didn't cover.
- q41: `operators.skew.salted_join` proven EQUIVALENT to the plain join by
  the gate itself (the oracle is the unsalted join) — the skew tool's
  correctness contract, checked on real data, not just unit fixtures.
- g01: PageRank with fixed damping/iterations in exact ppb fixed point —
  the canonical iterative-join workload; the oracle is the SAME recurrence
  unrolled as a CTE chain, so every intermediate rank is pinned.
- d24: documents bucketed head/middle/tail by bigram-LM predictability
  (the CCNet quality-bucketing pass), stacked on d10's exact scorer.

Determinism discipline as everywhere (plans/_util.py): integer fixed point,
DECIMAL-exact sums, deterministic tie-breaks on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dsum, t
from etl_docker_spark.plans.llm_queries import D10_SQL

# ---------------------------------------------------------------- q40

_TRAIL_DAYS = 30


def q40_trailing_spend_range(spark: SparkSession, sf: str) -> DataFrame:
    """Per order: the customer's trailing-30-day spend and order count, via
    a RANGE window frame over the epoch-day index (peers on the same day
    aggregate together — RANGE, not ROWS, semantics).

    The rolling-metrics shape (trailing revenue, 30-day actives) that ROWS
    frames can't express when event spacing is irregular. Scale: one hash
    partition by customer + partition-local sort; the frame is computed in
    a single pass per partition (Spark's window operator keeps a sliding
    aggregate buffer — no per-row rescan).
    """
    orders = t(spark, sf, "orders")
    # long, not int: DuckDB datediff emits BIGINT and the external hash
    # is type-sensitive — widths must agree cross-engine (round-5 sweep)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("long")
    w = (Window.partitionBy("o_custkey").orderBy("day_idx")
         .rangeBetween(-_TRAIL_DAYS, 0))
    return (orders
            .select("o_custkey", "o_orderkey", day.alias("day_idx"),
                    F.col("o_totalprice"))
            .select("o_custkey", "o_orderkey", "day_idx",
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
                    .cast("double").alias("trailing_spend"),
                    F.count("*").over(w).alias("trailing_orders")))


Q40_SQL = f"""
SELECT o_custkey, o_orderkey,
       datediff('day', DATE '1970-01-01', o_orderdate) AS day_idx,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS VARCHAR)
            AS DOUBLE) AS trailing_spend,
       COUNT(*) OVER w AS trailing_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN {_TRAIL_DAYS} PRECEDING AND CURRENT ROW)
"""

# ---------------------------------------------------------------- q41


def q41_salted_segment_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per market segment computed THROUGH `salted_join` — the skew
    mitigation operator — with the plain unsalted join as the oracle. The
    gate thereby proves the salting transform is semantics-preserving on
    real data (same rows, same exact sums), not just on unit fixtures.

    Scale: the big side (orders) is salted over 8 buckets on o_orderkey,
    the small side (customer) replicated 8-fold; a pathological hot
    customer key spreads over 8 tasks instead of one straggler. Salt
    columns never leave the join.
    """
    from etl_docker_spark.operators.skew import salted_join

    orders = (t(spark, sf, "orders")
              .select(F.col("o_custkey").alias("custkey"),
                      "o_orderkey", "o_totalprice"))
    cust = (t(spark, sf, "customer")
            .select(F.col("c_custkey").alias("custkey"), "c_mktsegment"))
    joined = salted_join(orders, cust, on=["custkey"],
                         salt_from="o_orderkey", n=8)
    return (joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(dsum("o_totalprice").alias("revenue"),
                 F.count("*").alias("n_orders")))


Q41_SQL = """
SELECT c.c_mktsegment AS segment,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

# ---------------------------------------------------------------- g01

_PR_ITERS = 5
_PR_S = 1_000_000_000  # rank fixed-point scale (ppb)


def g01_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations) over the customer-supplier
    trade graph, in exact ppb integer fixed point.

    Graph: an undirected edge per distinct (customer, supplier) pair that
    traded (orders x lineitem), materialized as two directed edges; node
    ids are 2*custkey and 2*suppkey+1. Every node then has in- and
    out-degree >= 1, so the plain aggregate form of the recurrence
        pr'(v) = (0.15*S) div N + (85 * sum_{u->v} (pr(u) div outdeg(u))) div 100
    covers every node (no dangling-mass term) and is bit-reproducible in
    any engine — the oracle unrolls the SAME recurrence as a CTE chain.

    Scale shape: the edge list builds once (the orders/lineitem join is the
    only corpus-sized work), DST-partitioned and localCheckpoint'ed with
    its outdegrees. While the rank frame fits a broadcast (node count read
    once off the checkpointed edges — the graph here has ~160k nodes at
    ~sf1), each iteration is then exchange-FREE on the edge side: ranks
    broadcast into the src join, and the dst re-aggregation lands on the
    edges' own partitioning — no edge-width shuffle anywhere, 1.5x
    measured at ~sf1. Past the broadcast bound (a billion-node graph) the
    same loop degrades to the shuffle join of rank-width rows against
    dst-bucketed edges — the fallback branch below, never a shuffle of the
    underlying fact tables either way.
    """
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select((F.col("o_custkey") * 2).alias("c"),
                     (F.col("l_suppkey") * 2 + 1).alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionAll(pairs.select(F.col("s").alias("src"),
                                    F.col("c").alias("dst"))))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    par = spark.sparkContext.defaultParallelism
    edges = (edges.join(deg, "src")
             .repartition(par, "dst").localCheckpoint())

    # one distinct pass over the edge list serves both the node count and
    # the rank seed (it used to run twice: count_distinct + distinct —
    # at graph scale that distinct IS a full edge aggregation, so halve it);
    # the 16-byte node frame is then the thing counted and re-read
    nodes = edges.select("src").distinct().localCheckpoint()
    n = nodes.count()
    base = (15 * _PR_S) // (100 * n)  # positive ints: // == engine div
    ranks = nodes.select(F.col("src").alias("node"),
                         F.lit(_PR_S // n).cast("long").alias("pr"))
    broadcastable = n <= 500_000
    for _ in range(_PR_ITERS):
        r = F.broadcast(ranks) if broadcastable else ranks
        contrib = (edges.join(r, edges.src == r["node"])
                   .select("dst", F.expr("pr div outdeg").alias("w")))
        ranks = (contrib.groupBy("dst")
                 .agg(F.sum("w").alias("inflow"))
                 .select(F.col("dst").alias("node"),
                         (F.lit(base).cast("long")
                          + F.expr("(85 * inflow) div 100")).alias("pr")))
    return ranks.select("node", F.col("pr").alias("pagerank_ppb"))


def _g01_sql() -> str:
    iters = "".join(
        f""",
p{i + 1} AS (
  SELECT e.dst AS node,
         (15 * CAST({_PR_S} AS BIGINT)) // (100 * (SELECT n FROM nn))
         + (85 * SUM(p{i}.pr // e.outdeg)) // 100 AS pr
  FROM e JOIN p{i} ON e.src = p{i}.node
  GROUP BY e.dst
)"""
        for i in range(_PR_ITERS))
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ed AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
e AS (SELECT ed.src, ed.dst, deg.outdeg FROM ed JOIN deg USING (src)),
nn AS (SELECT COUNT(DISTINCT src) AS n FROM e),
p0 AS (
  SELECT src AS node, CAST({_PR_S} AS BIGINT) // (SELECT n FROM nn) AS pr
  FROM (SELECT DISTINCT src FROM e)
){iters}
SELECT node, CAST(pr AS BIGINT) AS pagerank_ppb FROM p{_PR_ITERS}
"""


G01_SQL = _g01_sql()

# ---------------------------------------------------------------- d24


def d24_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style quality bucketing: documents split head/middle/tail by
    bigram-LM predictability (d10's exact scorer), using the
    length-normalized score lm_score div n_bigrams (a fixed-point
    per-bigram probability — the perplexity proxy).

    ntile(3) over (norm score desc, doc_id) gives deterministic,
    engine-identical buckets (exact rank arithmetic, no float quantile
    interpolation). The oracle stays the plain global ntile(3); the Spark
    plan computes the SAME tiling distributed: each doc's global rank is
    a two-phase prefix sum over the score order (operators/prefix.py —
    range-partition, local running count, K-row offset merge), and the
    tile follows from rank + total count by the exact ntile formula
    (first n%3 tiles hold one extra row), the q43 pattern. The earlier
    single-task ntile window over the corpus-sized per-doc frame was one
    of the three plans flagged as 100 TB scale-killers in round 3.
    """
    from etl_docker_spark.operators.prefix import prefix_sum_ordered
    from etl_docker_spark.plans.llm_queries import bigram_scores_frame

    scored = bigram_scores_frame(spark, sf)
    norm = F.expr("lm_score div n_bigrams")
    per_doc = (scored.select("doc_id", norm.alias("norm_score"))
               .withColumn("__one", F.lit(1)))
    ranked = prefix_sum_ordered(
        per_doc, [F.desc("norm_score"), F.asc("doc_id")], "__one", "r")
    n1 = per_doc.agg(F.count("*").alias("n"))
    # ntile(3): q = n div 3, m = n mod 3; tiles 1..m hold q+1 rows
    tile = F.expr(
        "CASE WHEN r <= (n DIV 3 + 1) * (n % 3) "
        "THEN (r - 1) DIV (n DIV 3 + 1) + 1 "
        "ELSE (n % 3) + (r - (n % 3) * (n DIV 3 + 1) - 1) DIV (n DIV 3) + 1 "
        "END")
    bucket = (F.when(tile == 1, "head")
              .when(tile == 2, "middle")
              .otherwise("tail"))
    return (ranked.crossJoin(F.broadcast(n1))
            .select("doc_id", "norm_score", bucket.alias("bucket")))


D24_SQL = f"""
WITH scored AS (
  SELECT doc_id, n_bigrams, lm_score FROM ({D10_SQL})
),
tiled AS (
  SELECT doc_id, lm_score // n_bigrams AS norm_score,
         ntile(3) OVER (ORDER BY lm_score // n_bigrams DESC, doc_id) AS tile
  FROM scored
)
SELECT doc_id, norm_score,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM tiled
"""


ROUND2E = {
    "q40_trailing_spend_range": (q40_trailing_spend_range, Q40_SQL),
    "q41_salted_segment_revenue": (q41_salted_segment_revenue, Q41_SQL),
    "g01_pagerank": (g01_pagerank, G01_SQL),
    "d24_perplexity_buckets": (d24_perplexity_buckets, D24_SQL),
}
