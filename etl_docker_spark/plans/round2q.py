"""Round-2 seventeenth batch: time-series gap filling and filtered vector
search.

- q57: calendar densification + forward fill — the resample/interpolate
  idiom every time-series pipeline needs: a sparse daily aggregate joined
  onto the full calendar, missing days carrying count 0 and the last
  observed value forward. Window `last(ignorenulls)` on the Spark side,
  `last_value(x IGNORE NULLS)` in the oracle — the gate pins that the
  two engines' fill semantics agree exactly.
- e15: FILTERED ANN search — top-k under a metadata predicate, the query
  shape production vector stores are measured on (filters interact badly
  with ANN indexes: pre-filtering empties cells, post-filtering starves
  k). Implemented as IVF cell routing with the predicate applied to the
  candidate stream (single-visit filter-during-search); the exact-scan
  oracle applies the same predicate, so the gate prices exactly what the
  cell routing loses under filters.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- q57

_Q57_K_MIN = 97  # sparse slice: props.k >= 97 (~3% of events) so gaps exist


def q57_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Daily totals for a sparse event slice, densified over the full
    calendar with forward-filled values.

    Plan shape: the sparse aggregate is one map-side-combined groupBy;
    the calendar is a 1-row bounds aggregate crossJoined with the
    distinct type list and exploded (rows = days x types, tiny); the
    left join hangs the observations on it; the forward fill is one
    window per type. At 100 TB the same plan holds — the calendar frame
    is days x types no matter the fact size.
    """
    ev = (t(spark, sf, "events")
          .filter(F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
                  >= _Q57_K_MIN)
          .select("event_type", F.date_trunc("day", "ts").alias("day"),
                  F.col("value").cast("decimal(12,4)").alias("v")))
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("n_events"),
        F.sum("v").alias("day_total"))
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    types = daily.select("event_type").distinct()
    cal = (types.crossJoin(F.broadcast(bounds))
           .select("event_type",
                   F.explode(F.sequence(
                       F.to_date("mn"), F.to_date("mx"))).alias("d"))
           .select("event_type", F.col("d").cast("timestamp").alias("day")))
    joined = cal.join(daily, ["event_type", "day"], "left")
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return joined.select(
        "event_type", "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("day_total", ignorenulls=True).over(w).cast("double")
        .alias("total_ff"),
        F.col("day_total").isNull().alias("is_gap"))


Q57_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(value AS DECIMAL(12,4)) AS v
  FROM events
  WHERE CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
        >= {_Q57_K_MIN}
),
daily AS (
  SELECT event_type, day, COUNT(*) AS n_events, SUM(v) AS day_total
  FROM ev GROUP BY 1, 2
),
bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
cal AS (
  SELECT event_type, CAST(d AS TIMESTAMP) AS day
  FROM (SELECT DISTINCT event_type FROM daily),
       bounds,
       LATERAL (SELECT unnest(generate_series(CAST(mn AS DATE),
                                              CAST(mx AS DATE),
                                              INTERVAL 1 DAY)) AS d)
),
joined AS (
  SELECT cal.event_type, cal.day, daily.n_events, daily.day_total
  FROM cal LEFT JOIN daily USING (event_type, day)
)
SELECT event_type, day,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CAST(CAST(last_value(day_total IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE)
         AS total_ff,
       day_total IS NULL AS is_gap
FROM joined
"""

# ---------------------------------------------------------------- e15

_E15_K = 5
_E15_NQ = 8


def e15_filtered_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered ANN: top-5 cosine neighbors with label % 3 = 1, routed
    through e05's trained cells with the predicate applied to the
    candidate stream (filter-during-search — one visit per candidate,
    no second pass; post-filtering the unfiltered top-k would starve k,
    pre-filter exact scan is the oracle's job).

    Reuses the memoized cell assignments; the label predicate prunes the
    candidate side BEFORE the dot products, so filter selectivity
    directly divides the scoring work — the property that makes
    filter-during-search the scalable formulation.
    """
    from etl_docker_spark.llm.similarity import dot_expr, norm2_expr
    from etl_docker_spark.plans.round2 import e05_assignments

    assign = e05_assignments(spark, sf)
    e = t(spark, sf, "embeddings").select(
        "vec_id", "label", "embedding",
        norm2_expr(F.col("embedding")).alias("n2"))
    ea = e.join(assign, "vec_id")
    q = (ea.filter(F.col("vec_id") < _E15_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("n2").alias("qn2"), "cluster"))
    cand = (ea.filter(F.col("label") % 3 == 1)
            .join(F.broadcast(q), "cluster")
            .filter(F.col("vec_id") != F.col("query_id")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "label",
        (dot_expr(F.col("qv"), F.col("embedding"))
         / F.sqrt(F.col("qn2") * F.col("n2"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _E15_K)
            .select("query_id", "neighbor_id", "label",
                    F.round("cosine", 8).alias("cosine"), "rank"))


def _e15_sql() -> str:
    from etl_docker_spark.plans.round2 import _DOT2, _E05_BODY

    return f"""
WITH {_E05_BODY.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
emb AS (
  SELECT vec_id, label, embedding,
         {_DOT2.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
ea AS (SELECT emb.*, assign.cluster FROM emb JOIN assign USING (vec_id)),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, n2 AS qn2, cluster
  FROM ea WHERE vec_id < {_E15_NQ}
),
scored AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id, ea.label,
         {_DOT2.format(a='q.qv', b='ea.embedding')}
           / sqrt(q.qn2 * ea.n2) AS cos_raw
  FROM ea JOIN q ON ea.cluster = q.cluster AND ea.vec_id <> q.query_id
  WHERE ea.label % 3 = 1
)
SELECT query_id, neighbor_id, label, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {_E15_K}
"""


ROUND2Q = {
    "q57_gap_fill": (q57_gap_fill, Q57_SQL),
    "e15_filtered_knn": (e15_filtered_knn, _e15_sql()),
}
