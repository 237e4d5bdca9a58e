"""Round-2 second batch: multi-dimensional GROUPING SETS, correlated
EXISTS, exact interpolated percentiles, an as-of temporal self-join, a
KMV distinct-count sketch, deterministic stratified sampling, and
token-budget corpus curation.

The sketch/sampling/curation trio are the "training-data pipeline at
100 TB" operations: cardinality estimation that merges across partitions,
reproducible subsampling, and a budgeted corpus cut — each expressed so a
DuckDB oracle reproduces it bit-for-bit (portable md5, integer fixed-point,
exact-decimal sums; see plans/_util.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- q34


def q34_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-dimensional aggregate over explicit GROUPING SETS — the full
    cube of (returnflag, linestatus) plus each margin and the grand total.

    Beyond q15's hierarchical ROLLUP: grouping sets are the general shape
    (margins are NOT nested). Scale formulation: Catalyst's Expand node
    duplicates every input row per grouping set, so expanding the FACT
    table multiplies the shuffle by the set count. Every aggregate here
    is algebraic (decimal sums, counts — exactly re-aggregable), so the
    fact table first collapses to the finest grain (one ordinary
    map-side-combined shuffle; single-digit rows), and GROUPING SETS
    expands only that tiny frame. Measured 2.8 s -> 1.0 s at ~sf1,
    bit-identical (decimal partials re-sum exactly). GROUPING() flags
    are surfaced (cast BIGINT) because COALESCE alone cannot distinguish
    a real 'ALL' key from the aggregated-away marker.
    """
    t(spark, sf, "lineitem").createOrReplaceTempView("q34_lineitem")
    return spark.sql("""
        WITH base AS (
          SELECT l_returnflag, l_linestatus,
                 SUM(CAST(l_quantity AS DECIMAL(12,4))) AS sq,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS rv,
                 COUNT(*) AS n
          FROM q34_lineitem GROUP BY l_returnflag, l_linestatus
        )
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
               CAST(SUM(sq) AS DOUBLE) AS sum_qty,
               CAST(SUM(rv) AS DOUBLE) AS revenue,
               SUM(n) AS n_lines
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
    """)


Q34_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR)
            AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
"""

# ---------------------------------------------------------------- q35


def q35_exists_late_ship(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): 1996 orders with at least one
    line shipped more than 60 days after the order date, counted by
    priority.

    Exercises the EXISTS-subquery surface; Catalyst rewrites it to a LEFT
    SEMI join on l_orderkey (one existence probe, no per-row re-execution
    — the reference's idiom is a row loop with an inner query). The date
    filter prunes the orders scan before the join.
    """
    t(spark, sf, "orders").createOrReplaceTempView("q35_orders")
    t(spark, sf, "lineitem").createOrReplaceTempView("q35_lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM q35_orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM q35_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """)


Q35_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------- q36


def q36_exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quartiles of l_quantity per return flag.

    `percentile` (Spark) and `quantile_cont` (DuckDB) both compute
    pos = (n-1)*p and linearly interpolate between the two neighbors.
    Over INTEGRAL quantities with quarter fractions every intermediate is
    an exact double, so the interpolated values are bit-identical — exact
    percentiles stay oracle-checkable. (The at-scale variant is the
    approx_percentile sketch; its error bound is engine-specific, so the
    EXACT form is what the gate pins.) One shuffle on the group key; the
    per-group sort is the unavoidable cost of exact order statistics.
    """
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count("*").alias("n_lines"),
    )


Q36_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5)  AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------- q37


def q37_asof_view_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of temporal self-join: each view event paired with the same
    user's most recent purchase at-or-before it (NULLs when none yet).

    Runs THROUGH operators/asof.py — the union+window encoding: ONE
    shuffle on the key, running `last(ignorenulls)` carries the purchase
    forward, no pairwise time-range join to blow up. The oracle is
    DuckDB's native ASOF LEFT JOIN, so equality checks our encoding
    against a reference implementation of the semantics. Purchases are
    pre-deduped per (user, ts) — ASOF requires unique right timestamps.
    """
    from etl_docker_spark.operators.asof import asof_join_backward

    ev = t(spark, sf, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"), "user_id", "ts"))
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1)
                 .select("user_id", F.col("ts").alias("pts"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("value").alias("purchase_value")))
    joined = asof_join_backward(
        views, purchases, on=["user_id"], left_ts="ts", right_ts="pts",
        value_cols=["purchase_id", "purchase_value", "pts"])
    return joined.select(
        "view_id", "user_id", "ts", "purchase_id", "purchase_value",
        (F.unix_micros("ts") - F.unix_micros("pts")).alias("since_us"))


Q37_SQL = """
WITH v AS (
  SELECT event_id AS view_id, user_id, ts FROM events
  WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts AS pts, event_id AS purchase_id,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
)
SELECT v.view_id, v.user_id, v.ts, p.purchase_id, p.purchase_value,
       epoch_us(v.ts) - epoch_us(p.pts) AS since_us
FROM v ASOF LEFT JOIN p
  ON v.user_id = p.user_id AND p.pts <= v.ts
"""

# ---------------------------------------------------------------- d16

_KMV_K = 64
_KMV_RANGE = float(1 << 32)


def d16_kmv_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type:
    estimate |distinct users| from the k smallest md5 hash values.

    The deterministic, mergeable answer to approx_count_distinct: HLL
    registers are engine-private, but "the k smallest values of a shared
    hash" is engine-neutral state — estimate (k-1) * 2^32 / h_(k), exact
    when fewer than k distinct values exist. Two-stage k-smallest keeps it
    scale-shaped: per-(group, salt) top-k first (parallel windows over
    small partitions), then top-k of the <= k*salts survivors — no group
    ever sorts more than k*salts rows at once, the same merge that makes
    KMV sketches unionable across partitions. Estimator quality is
    unit-tested (tests/test_operators.py); the gate pins exactness.
    """
    du = (t(spark, sf, "events")
          .select("event_type", "user_id").distinct())
    h = du.select(
        "event_type", "user_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")
                                 .cast("binary")), 1, 8), 16, 10)
        .cast("long").alias("h"),
        F.pmod("user_id", F.lit(8)).alias("salt"),
    )
    w1 = Window.partitionBy("event_type", "salt").orderBy("h", "user_id")
    stage1 = (h.withColumn("rn", F.row_number().over(w1))
              .filter(F.col("rn") <= _KMV_K).drop("rn"))
    w2 = Window.partitionBy("event_type").orderBy("h", "user_id")
    kth = (stage1.withColumn("rn", F.row_number().over(w2))
           .filter(F.col("rn") <= _KMV_K)
           .groupBy("event_type")
           .agg(F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk")))
    exact = du.groupBy("event_type").agg(
        F.count("*").cast("long").alias("exact_distinct"))
    return (exact.join(kth, "event_type")
            .select(
                "event_type", "exact_distinct",
                F.when(F.col("exact_distinct") < _KMV_K,
                       F.col("exact_distinct").cast("double"))
                .otherwise(F.lit(float(_KMV_K - 1) * _KMV_RANGE)
                           / F.col("hk"))
                .alias("est_distinct")))


D16_SQL = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type, user_id,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
              AS BIGINT) AS h
  FROM du
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY h, user_id) AS rn
  FROM h
),
kth AS (
  SELECT event_type,
         MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
  FROM r GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM du GROUP BY event_type
)
SELECT e.event_type, e.exact_distinct,
       CASE WHEN e.exact_distinct < {_KMV_K}
            THEN CAST(e.exact_distinct AS DOUBLE)
            ELSE {float(_KMV_K - 1)} * {_KMV_RANGE} / k.hk
       END AS est_distinct
FROM exact e JOIN kth k USING (event_type)
"""

# ---------------------------------------------------------------- d17

# per-language keep rates in parts-per-million (integer compare — exact).
_SAMPLE_PPM = {"en": 250_000, "es": 500_000, "fr": 750_000,
               "de": 500_000, "zh": 100_000}
_SAMPLE_DEFAULT_PPM = 100_000


def d17_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: keep each document iff
    md5(doc_id) mod 1e6 falls under its language's keep-rate.

    How a training pipeline downsamples over-represented languages
    REPRODUCIBLY: the keep decision is a pure function of the stable id —
    re-runs, retries, and other engines select the identical subset (the
    gate proves it), unlike rand()-based Bernoulli sampling. Embarrassingly
    parallel: a codegen'd filter on the scan, no shuffle, no state.
    """
    rate = F.lit(_SAMPLE_DEFAULT_PPM)
    for lang, ppm in _SAMPLE_PPM.items():
        rate = F.when(F.col("lang") == lang, F.lit(ppm)).otherwise(rate)
    docs = t(spark, sf, "documents")
    return (docs.withColumn(
                "sample_key",
                F.pmod(F.conv(F.substring(F.md5(F.col("doc_id").cast("string")
                                                .cast("binary")), 1, 8),
                              16, 10).cast("long"),
                       F.lit(1_000_000)))
            .filter(F.col("sample_key") < rate)
            .select("doc_id", "lang", "source", "sample_key"))


_D17_CASE = " ".join(
    f"WHEN '{lang}' THEN {ppm}" for lang, ppm in _SAMPLE_PPM.items())
D17_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, source,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000000 AS sample_key
  FROM documents
)
SELECT doc_id, lang, source, sample_key
FROM keyed
WHERE sample_key < CASE lang {_D17_CASE} ELSE {_SAMPLE_DEFAULT_PPM} END
"""

# ---------------------------------------------------------------- d18


def d18_token_budget_curation(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget corpus cut: rank documents by quality score and keep
    the best until half the corpus's token mass is spent.

    The last step of a curation pipeline — "give me the best N tokens" —
    as a distributed prefix sum (operators/prefix.py): range-partition by
    the ranking, local running sums, per-partition offsets. The naive
    `SUM OVER (ORDER BY ...)` global window is ONE task at 100 TB; this
    shape stays parallel. Budget test is `2*cum <= total` in BIGINTs —
    no float division to disagree on. Ranking ties break on doc_id, so
    the cut is a strict total order (reproducible manifest).
    """
    from etl_docker_spark.llm.text import quality_features
    from etl_docker_spark.operators.prefix import prefix_sum_ordered

    docs = t(spark, sf, "documents")
    feats = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id", feats["n_tokens"].alias("n_tokens"),
        feats["quality_score"].alias("quality_score"))
    cum = prefix_sum_ordered(
        scored, [F.desc("quality_score"), F.asc("doc_id")],
        "n_tokens", out_col="cum_tokens")
    total = scored.agg(F.sum("n_tokens").alias("__total"))
    return (cum.crossJoin(F.broadcast(total))
            .filter(F.lit(2) * F.col("cum_tokens") <= F.col("__total"))
            .select("doc_id", "n_tokens", "cum_tokens"))


_D18_EN = ", ".join(f"'{w}'" for w in
                    ("the", "and", "of", "to", "a", "in", "is", "it",
                     "that", "for"))
D18_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\w+|[^\w\s]') AS toks
  FROM documents
),
q AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         (CAST(len(list_filter(toks, tk -> list_contains([{_D18_EN}], tk)))
               AS BIGINT) / CAST(len(toks) AS BIGINT)) * 0.5
         + (CAST(len(list_distinct(toks)) AS BIGINT)
            / CAST(len(toks) AS BIGINT)) * 0.5 AS quality_score
  FROM toks
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_tokens,
         SUM(n_tokens) OVER () AS total
  FROM q
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE 2 * cum_tokens <= total
"""


ROUND2B = {
    "q34_grouping_sets": (q34_grouping_sets, Q34_SQL),
    "q35_exists_late_ship": (q35_exists_late_ship, Q35_SQL),
    "q36_exact_percentiles": (q36_exact_percentiles, Q36_SQL),
    "q37_asof_view_purchase": (q37_asof_view_purchase, Q37_SQL),
    "d16_kmv_distinct_sketch": (d16_kmv_distinct_sketch, D16_SQL),
    "d17_stratified_sample": (d17_stratified_sample, D17_SQL),
    "d18_token_budget_curation": (d18_token_budget_curation, D18_SQL),
}
