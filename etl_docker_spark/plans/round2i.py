"""Round-2 ninth batch: sequential-event sessionization, incremental
aggregate maintenance, weighted corpus sampling, and the IVFPQ recall
measurement.

- q45: batch sessionization (gaps-and-islands, 30-minute inactivity gap) —
  the batch twin of the streaming session windows (s02), built from two
  window passes over one user_id partitioning.
- q46: incremental aggregate maintenance — partial aggregates over two
  disjoint slices of the fact, merged by RE-aggregation, gated against the
  full recompute. This is the materialized-view maintenance contract at
  100 TB: yesterday's aggregate plus today's delta must equal the full
  scan, which requires the partials to stay in exact (decimal) state until
  the final cast.
- d31: weighted systematic sampling — pick ~K documents with probability
  proportional to size (n_chars) by walking the cumulative-weight line
  with a fixed stride. Deterministic (no RNG), integer-exact, and the
  cumulative sum is computed DISTRIBUTED: per-block window + tiny
  block-offset frame (the two-phase prefix-sum idiom, same discipline as
  q43's ntile) — never one global sort task.
- e12: recall@5 of the IVFPQ index (e11) against the exact scan (e01) —
  the measurement that closes the compression story: how much recall the
  coarse routing + 4-byte codes give up. Same oracle-splicing discipline
  as e03 (grid-IVF recall).

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dsum, t

# ---------------------------------------------------------------- q45

_SESS_GAP_MIN = 30


def q45_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands sessionization: events more than 30 minutes apart
    start a new session; per session report bounds, size, and value.

    One shuffle total: both window passes (new-session flag via lag, then
    running session counter) and the final groupBy all share the user_id
    hash partitioning — Catalyst plans a single Exchange. Ties on ts order
    by event_id so session numbering is total-ordered and reproducible.
    """
    ev = t(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _SESS_GAP_MIN * 60 * 1_000_000
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(prev.isNull()
               | (F.unix_micros(F.col("ts")) - prev > gap_us), 1)
        .otherwise(0))
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    return (sess.groupBy("user_id", "sess_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("start_ts"),
                 F.max("ts").alias("end_ts"),
                 (F.unix_micros(F.max("ts"))
                  - F.unix_micros(F.min("ts"))).alias("duration_us"),
                 dsum("value").alias("total_value")))


Q45_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {_SESS_GAP_MIN * 60 * 1000000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS sess_id
  FROM flagged
)
SELECT user_id, sess_id, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS total_value
FROM sess GROUP BY user_id, sess_id
"""

# ---------------------------------------------------------------- q46


def q46_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate maintenance: the fact splits into a BASE slice
    (event_id % 10 < 8) and a DELTA slice; each aggregates independently
    and the two partial states merge by re-aggregation. The oracle is the
    single-pass aggregate over everything — equality is the view-
    maintenance contract (merge(partial, delta) == recompute).

    The load-bearing detail: partial sums stay DECIMAL through the merge
    and cast to DOUBLE only at the end. Partials that round to double
    early would drift from the full recompute — the same reason Spark's
    own agg buffers keep exact intermediate state.
    """
    ev = t(spark, sf, "events").select("event_type", "event_id", "value")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,4)")).alias("s"))

    base = partial(ev.filter(F.col("event_id") % 10 < 8))
    delta = partial(ev.filter(F.col("event_id") % 10 >= 8))
    return (base.unionByName(delta)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.sum("s").cast("double").alias("total_value")))


Q46_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS total_value
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------- d31

_SAMPLE_K = 25
_SAMPLE_BLOCK = 64


def d31_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted systematic sampling: ~K documents picked with probability
    proportional to n_chars by striding the cumulative-size line — a doc is
    picked iff a stride boundary falls inside its weight interval. The
    deterministic, single-pass way to draw a size-weighted corpus subset
    (the mixture-sampling primitive behind d23's weights).

    The cumulative sum never becomes one global sort task: docs bucket into
    doc_id-blocks, the running sum is per-block (parallel window), and
    block offsets come from the blocks-count frame prefix-summed via the
    two-phase operators/prefix.py form (that frame grows with the corpus
    — n_docs/block — so it must not be a global window either) and
    broadcast back. Integer arithmetic end to end.
    """
    from etl_docker_spark.operators.prefix import prefix_sum_ordered

    docs = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    docs = docs.withColumn("blk", F.expr(f"doc_id div {_SAMPLE_BLOCK}"))
    win = Window.partitionBy("blk").orderBy("doc_id")
    cum_in = F.sum("n_chars").over(
        win.rowsBetween(Window.unboundedPreceding, 0))
    bt = docs.groupBy("blk").agg(F.sum("n_chars").alias("bsum"))
    offsets = (prefix_sum_ordered(bt, [F.asc("blk")], "bsum", "__cum")
               .select("blk", (F.col("__cum") - F.col("bsum")).alias("off")))
    total = docs.agg(F.sum("n_chars").alias("tot"))
    cum = (docs.withColumn("cum_in", cum_in)
           .join(F.broadcast(offsets), "blk")
           .crossJoin(F.broadcast(total))
           .withColumn("cum", F.col("off") + F.col("cum_in"))
           .withColumn("stride",
                       F.expr(f"greatest(tot div {_SAMPLE_K}, 1)")))
    picked = cum.filter(
        F.expr("(cum - n_chars) div stride < cum div stride"))
    return picked.select("doc_id", "lang", "n_chars",
                         F.col("cum").alias("cum_chars"))


D31_SQL = f"""
WITH cum AS (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             AS cum_chars,
         greatest(SUM(n_chars) OVER () // {_SAMPLE_K}, 1) AS stride
  FROM documents
)
SELECT doc_id, lang, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
FROM cum
WHERE (cum_chars - n_chars) // stride < cum_chars // stride
"""

# ---------------------------------------------------------------- e12


def e12_ivfpq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@5 of the IVFPQ index: per query, how many of the exact top-5
    (e01) the routed + PQ-coded search (e11) returned. The number that
    prices the 64x vector compression + cell routing: the index is only as
    good as this column says.

    Both sides reuse the already-gated pipelines; the comparison is a
    5-rows-per-query join — measurement cost is the two searches, not the
    comparison. (e03 measures the same dial for the static-grid IVF.)
    """
    from etl_docker_spark.llm.similarity import brute_force_knn
    from etl_docker_spark.plans.round2g import _ADC_K, _ADC_NQ
    from etl_docker_spark.plans.round2h import e11_ivfpq_search

    emb = t(spark, sf, "embeddings")
    exact = brute_force_knn(emb, emb.filter(F.col("vec_id") < _ADC_NQ),
                            k=_ADC_K).select("query_id", "neighbor_id")
    adc = e11_ivfpq_search(spark, sf).select("query_id", "neighbor_id")
    matched = (exact.join(adc, ["query_id", "neighbor_id"])
               .groupBy("query_id").agg(F.count("*").alias("n_matched")))
    qids = exact.select("query_id").distinct()
    return (qids.join(matched, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_matched", F.lit(0)).cast("long")
                    .alias("n_matched"))
            .withColumn("recall_ppm",
                        F.expr(f"n_matched * 1000000 div {_ADC_K}")))


def _e12_sql() -> str:
    from etl_docker_spark.plans.llm_queries import _DOT
    from etl_docker_spark.plans.round2g import _ADC_K, _ADC_NQ
    from etl_docker_spark.plans.round2h import ivfpq_common_sql

    return (ivfpq_common_sql() + f""",
exq AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {_ADC_NQ}
),
exscored AS (
  SELECT exq.query_id, e.vec_id AS neighbor_id,
         {_DOT.format(a='exq.qv', b='e.embedding')}
           / sqrt({_DOT.format(a='exq.qv', b='exq.qv')}
                  * {_DOT.format(a='e.embedding', b='e.embedding')})
             AS cos_raw
  FROM embeddings e CROSS JOIN exq
  WHERE e.vec_id <> exq.query_id
),
exact_top AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_raw DESC, neighbor_id ASC)
              AS BIGINT) AS rank
  FROM exscored
  QUALIFY rank <= {_ADC_K}
),
matched AS (
  SELECT x.query_id, COUNT(*) AS n_matched
  FROM exact_top x JOIN adc_top a
    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
  GROUP BY x.query_id
)
SELECT q.query_id, CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched,
       CAST(COALESCE(m.n_matched, 0) AS BIGINT) * 1000000 // {_ADC_K}
           AS recall_ppm
FROM (SELECT DISTINCT query_id FROM exact_top) q
LEFT JOIN matched m ON m.query_id = q.query_id""")


# ---------------------------------------------------------------- q47


def q47_global_outlier_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: per market segment, count customers whose account
    balance exceeds the GLOBAL positive-balance average AND who have
    placed no order since 2001 — a global scalar subquery feeding a filter
    plus an anti-join, the decorrelation pattern Q22 exists to test. (Q22
    proper windows the anti-join by time; this corpus has no order-less
    customers at all, so the time window is what keeps the result
    non-trivial.)

    Plan shape: the scalar aggregate is one map-side-combined pass
    broadcast into the filter (one row); the no-orders condition is a
    broadcast anti-join on the distinct order custkeys. The big side
    (customer) is scanned once, never shuffled — the groupBy shuffles only
    surviving (segment, balance) rows. The "above average" compare is
    exact integer CROSS-MULTIPLICATION (bal*n > sum over scale-4 fixed
    point) — engine decimal division rounds differently engine-to-engine
    and a half-ulp would flip boundary rows.
    """
    cust = t(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        (F.col("c_acctbal").cast("decimal(18,4)") * 10000).cast("long")
        .alias("bal_i"))
    avg_pos = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.sum("bal_i").alias("s"), F.count("*").alias("n")))
    ok = (t(spark, sf, "orders")
          .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
          .select("o_custkey").distinct())
    rich = (cust.crossJoin(F.broadcast(avg_pos))
            .filter(F.col("bal_i") * F.col("n") > F.col("s"))
            .join(F.broadcast(ok),
                  cust.c_custkey == ok.o_custkey, "left_anti"))
    return (rich.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_customers"),
                 dsum("c_acctbal").alias("total_balance")))


Q47_SQL = """
WITH cb AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) AS bal_i
  FROM customer
),
avg_pos AS (
  SELECT SUM(bal_i) AS s, COUNT(*) AS n FROM cb WHERE c_acctbal > 0
)
SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
           AS total_balance
FROM cb c
WHERE c.bal_i * (SELECT n FROM avg_pos) > (SELECT s FROM avg_pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '2001-01-01')
GROUP BY c_mktsegment
"""


ROUND2I = {
    "q45_sessionize": (q45_sessionize, Q45_SQL),
    "q46_incremental_agg": (q46_incremental_agg, Q46_SQL),
    "d31_weighted_sample": (d31_weighted_sample, D31_SQL),
    "e12_ivfpq_recall": (e12_ivfpq_recall, _e12_sql()),
    "q47_global_outlier_customers": (q47_global_outlier_customers, Q47_SQL),
}
