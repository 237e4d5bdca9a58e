"""Round-2 fifteenth batch: sketch set operations, a data-quality audit,
and streaming SCD2 maintenance.

- d35: KMV/theta-sketch SET OPERATIONS — estimate the intersection and
  union of two corpus segments' 3-gram sets from two k-min-value sketches
  (the segment-overlap question sketches exist to answer without a
  distinct-join). Exact counts ride along so the error is measured, not
  claimed. Completes the sketch family's algebra: d16 builds a KMV, d28
  merges HLL registers, d32 merges CMS registers, d35 INTERSECTS sketches.
- q55: data-quality audit — one row per expectation (nulls, ranges,
  referential integrity, cross-table ordering) with violation counts and
  pass ppm; the Deequ-style monitoring pass a 100 TB ingest runs before
  publishing a partition (the engine-side generalization of the
  reference's count-verification + quarantine idioms, K7/A5).
- s11: SCD2 history maintained THROUGH the streaming engine — three
  out-of-order micro-batches folded by foreachBatch into an effective-
  dated history (streaming/cdc.scd2_stream_into). The oracle is the
  batch-recomputed history: equality proves arrival-order independence
  of the fold (late batches insert into the MIDDLE of history) and
  exactly-once-per-epoch. Composes q33's SCD2 semantics with s06's CDC
  transport.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d35

_KMV_K = 256
_KMV_U = 1 << 60  # hash universe: md5 15 hex chars
_D35_SEG_A, _D35_SEG_B = "src0", "src1"


def d35_sketch_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Theta-sketch intersection/union of two segments' 3-gram sets.

    Each segment keeps its K smallest distinct gram hashes; theta = the
    smaller of the two K-th minima; any hash below theta is a uniform
    sample of the universe, so |retained ∩| * U div theta estimates the
    true intersection (likewise union). Integer end to end (DECIMAL(38,0)
    promotion for the cross-multiply), so the gate pins the estimates
    exactly; exact counts come from the same distinct-hash frames.

    Scale shape: one shingling pass per segment collapses immediately to
    distinct hashes (map-side combined); the K-th minimum is a
    TakeOrdered (no global sort); retained-set comparisons join 2K-row
    frames. At 100 TB the sketches are the only thing that crosses the
    wire — the exact columns are the bench-scale measurement.
    """
    segs = {}
    for name in (_D35_SEG_A, _D35_SEG_B):
        docs = (t(spark, sf, "documents")
                .filter(F.col("source") == name)
                .select("doc_id", "text"))
        toks = F.split(F.col("text"), " ")
        rows = docs.select(
            "doc_id", F.size(toks).alias("sz"),
            F.posexplode(toks).alias("pos", "tok"))
        w = Window.partitionBy("doc_id").orderBy("pos")
        grams = (rows.select(
            "pos", "sz",
            F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w),
                        F.lead("tok", 2).over(w)).alias("g"))
            .filter(F.col("pos") <= F.col("sz") - 3))
        h = (F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 15),
                    16, 10).cast("long"))
        segs[name] = grams.select(h.alias("hv")).distinct().localCheckpoint()

    a, b = segs[_D35_SEG_A], segs[_D35_SEG_B]
    kth_a = a.orderBy("hv").limit(_KMV_K).agg(F.max("hv").alias("ka"))
    kth_b = b.orderBy("hv").limit(_KMV_K).agg(F.max("hv").alias("kb"))
    theta = (kth_a.crossJoin(kth_b)
             .select(F.least("ka", "kb").alias("theta")))

    ra = a.crossJoin(F.broadcast(theta)).filter(F.col("hv") < F.col("theta"))
    rb = b.crossJoin(F.broadcast(theta)).filter(F.col("hv") < F.col("theta"))
    inter_r = ra.select("hv").intersect(rb.select("hv")).agg(
        F.count("*").alias("n_inter_r"))
    union_r = ra.select("hv").union(rb.select("hv")).distinct().agg(
        F.count("*").alias("n_union_r"))
    exact_inter = a.select("hv").intersect(b.select("hv")).agg(
        F.count("*").alias("exact_intersection"))
    exact_union = a.select("hv").union(b.select("hv")).distinct().agg(
        F.count("*").alias("exact_union"))

    def est(cnt: str) -> F.Column:
        return F.expr(f"CAST((CAST({cnt} AS DECIMAL(38,0)) * {_KMV_U})"
                      " div theta AS BIGINT)")

    return (theta.crossJoin(F.broadcast(inter_r))
            .crossJoin(F.broadcast(union_r))
            .crossJoin(F.broadcast(exact_inter))
            .crossJoin(F.broadcast(exact_union))
            .select(
                F.lit(_KMV_K).cast("long").alias("k"),
                "theta",
                est("n_inter_r").alias("est_intersection"),
                "exact_intersection",
                est("n_union_r").alias("est_union"),
                "exact_union"))


D35_SQL = f"""
WITH ga AS (
  SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS hv
  FROM (
    SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
    FROM (SELECT string_split(text, ' ') AS tk FROM documents
          WHERE source = '{_D35_SEG_A}'),
         LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i)
  )
),
gb AS (
  SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS hv
  FROM (
    SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
    FROM (SELECT string_split(text, ' ') AS tk FROM documents
          WHERE source = '{_D35_SEG_B}'),
         LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i)
  )
),
theta AS (
  SELECT least(
    (SELECT MAX(hv) FROM (SELECT hv FROM ga ORDER BY hv LIMIT {_KMV_K})),
    (SELECT MAX(hv) FROM (SELECT hv FROM gb ORDER BY hv LIMIT {_KMV_K}))
  ) AS theta
),
ir AS (
  SELECT COUNT(*) AS n_inter_r FROM (
    SELECT hv FROM ga, theta WHERE hv < theta
    INTERSECT SELECT hv FROM gb, theta WHERE hv < theta)
),
ur AS (
  SELECT COUNT(*) AS n_union_r FROM (
    SELECT hv FROM ga, theta WHERE hv < theta
    UNION SELECT hv FROM gb, theta WHERE hv < theta)
),
ei AS (
  SELECT COUNT(*) AS exact_intersection FROM
    (SELECT hv FROM ga INTERSECT SELECT hv FROM gb)
),
eu AS (
  SELECT COUNT(*) AS exact_union FROM
    (SELECT hv FROM ga UNION SELECT hv FROM gb)
)
SELECT CAST({_KMV_K} AS BIGINT) AS k, theta,
       CAST((CAST(n_inter_r AS HUGEINT) * {_KMV_U}) // theta AS BIGINT)
         AS est_intersection,
       exact_intersection,
       CAST((CAST(n_union_r AS HUGEINT) * {_KMV_U}) // theta AS BIGINT)
         AS est_union,
       exact_union
FROM theta, ir, ur, ei, eu
"""

# ---------------------------------------------------------------- q55

_Q55_LATE_DAYS = 90


def q55_dq_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectations over lineitem: one row per rule with
    violation count and pass ppm.

    Single-table rules ride ONE conditional-aggregate pass (map-side
    combined to a handful of counters); the referential and cross-table
    ordering rules share one orderkey join. At 100 TB this audit runs
    per ingest partition before publish, and its output is the table the
    quarantine decision reads (the engine-side generalization of the
    reference's count-verification + Excel-quarantine idioms).
    """
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice",
        "l_shipdate")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")

    single = li.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .alias("null_shipdate"),
        F.sum(F.when(~F.col("l_quantity").between(1, 50), 1).otherwise(0))
        .alias("qty_out_of_range"),
        F.sum(F.when(~F.col("l_discount").between(0.0, 0.1), 1).otherwise(0))
        .alias("discount_out_of_range"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .alias("nonpositive_price"))
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
              .agg(
                  F.count("*").alias("n"),
                  F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
                  .alias("orphan_lineitem"),
                  F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)
                        .otherwise(0)).alias("ship_before_order"),
                  F.sum(F.when(
                      F.datediff("l_shipdate", "o_orderdate") > _Q55_LATE_DAYS,
                      1).otherwise(0)).alias("late_shipment_90d")))

    def rows_of(agg: DataFrame, rules: list[str]) -> DataFrame:
        pairs = F.array(*[
            F.struct(F.lit(r).alias("rule"),
                     F.col(r).cast("long").alias("n_violations"))
            for r in rules])
        return (agg.select("n", F.explode(pairs).alias("p"))
                .select(F.col("p.rule").alias("rule"),
                        F.col("p.n_violations").alias("n_violations"),
                        F.col("n").cast("long").alias("n_checked")))

    out = rows_of(single, ["null_shipdate", "qty_out_of_range",
                           "discount_out_of_range", "nonpositive_price"]) \
        .unionByName(rows_of(joined, ["orphan_lineitem", "ship_before_order",
                                      "late_shipment_90d"]))
    return out.withColumn(
        "pass_ppm",
        F.expr("(n_checked - n_violations) * 1000000 div n_checked"))


Q55_SQL = f"""
WITH single AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
           AS null_shipdate,
         SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
           AS qty_out_of_range,
         SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)
           AS discount_out_of_range,
         SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
           AS nonpositive_price
  FROM lineitem
),
joined AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
           AS orphan_lineitem,
         SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
           AS ship_before_order,
         SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                       > {_Q55_LATE_DAYS} THEN 1 ELSE 0 END)
           AS late_shipment_90d
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
),
rules AS (
  SELECT 'null_shipdate' AS rule, null_shipdate AS n_violations,
         n AS n_checked FROM single
  UNION ALL SELECT 'qty_out_of_range', qty_out_of_range, n FROM single
  UNION ALL SELECT 'discount_out_of_range', discount_out_of_range, n
            FROM single
  UNION ALL SELECT 'nonpositive_price', nonpositive_price, n FROM single
  UNION ALL SELECT 'orphan_lineitem', orphan_lineitem, n FROM joined
  UNION ALL SELECT 'ship_before_order', ship_before_order, n FROM joined
  UNION ALL SELECT 'late_shipment_90d', late_shipment_90d, n FROM joined
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_checked AS BIGINT) AS n_checked,
       CAST((CAST(n_checked AS BIGINT) - n_violations) * 1000000
            // n_checked AS BIGINT) AS pass_ppm
FROM rules
"""

# ---------------------------------------------------------------- s11


def s11_stream_scd2(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 history maintained through the streaming engine: the
    (user_id, ts)-deduped event feed arrives as three micro-batches SPLIT
    BY EVENT ID (deliberately out of time order) and each folds into the
    parquet history via scd2_stream_into. The oracle recomputes the
    history in one batch pass — equality proves the fold is
    arrival-order independent (a late batch inserts its versions into
    the MIDDLE of each key's timeline) and exactly-once.

    event_id rides in the attrs so every version is distinct (the no-op
    filter never collapses two updates) and the feed is pre-deduped per
    (user_id, ts) by max event_id, so (key, valid_from) is globally
    unique — the preconditions under which the fold is a pure function
    of the SET of updates, independent of batching.
    """
    import shutil
    import tempfile

    from etl_docker_spark.streaming.cdc import scd2_stream_into

    ev = t(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    feed = (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    work = tempfile.mkdtemp(prefix="s11_")
    src, target = f"{work}/src", f"{work}/hist"
    try:
        feed.repartitionByRange(3, "event_id").write.mode(
            "overwrite").parquet(src)
        stream = (spark.readStream.schema(feed.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = scd2_stream_into(stream, target, keys=["user_id"],
                             attrs=["value", "event_id"], ts_col="ts",
                             checkpoint=f"{work}/ckpt")
        q.awaitTermination(300)
        q.stop()
        return spark.read.parquet(target).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S11_SQL = """
WITH feed AS (
  SELECT user_id, value, event_id, ts
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
)
SELECT user_id, value, event_id, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM feed
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
"""


ROUND2O = {
    "d35_sketch_overlap": (d35_sketch_overlap, D35_SQL),
    "q55_dq_audit": (q55_dq_audit, Q55_SQL),
    "s11_stream_scd2": (s11_stream_scd2, S11_SQL),
}
