"""Round-6 queries, third batch: model-as-data classifier inference
(d59), the ANSI interval-type battery (q93), change-feed vs progress-
metrics reconciliation (s29), and the IVF -> binary -> exact serving
funnel (e24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND6C: dict = {}

# ---------------------------------------------------------------- d59

# the SAME model as d58 — imported, not redeclared, so the two plans'
# mutual pin (test_d59_totals_agree_with_d58) can never drift
from etl_docker_spark.plans.round6 import _D58_BIAS_PPM as _D59_BIAS_PPM
from etl_docker_spark.plans.round6 import _D58_BUCKETS as _D59_BUCKETS

# Calibration-histogram grid: 10 fixed ppm buckets over [-300, 300],
# clamped at the edges. Scores = mean feature weight + bias concentrate
# near the bias (measured raw range [-210, 302] ppm; see the d58 bias
# comment), so a grid matched to that spread populates the full
# histogram — the old [-3000, 1000] grid left deciles 5-9 unreachable.
_D59_GRID_LO = -300
_D59_GRID_W = 601


def d59_classifier_weight_join(spark: SparkSession, sf: str) -> DataFrame:
    """Classifier inference with the model as DATA: the same hashed
    unigram+bigram features as d58, but the per-bucket weights live in a
    (bucket, w_ppm) TABLE that is broadcast-joined, instead of being a
    closed-form expression folded per row. This is the plan you run the
    day the weights come from training instead of a formula — swapping
    the `range`-built frame for a parquet of trained weights changes
    nothing downstream.

    Plan contrast with d58 (the point of having both): d58 never leaves
    the row — transform+aggregate folds the score inside the scan
    projection, zero extra operators; here each feature occurrence is
    EXPLODED to a row, hash-bucketed, broadcast-joined to the weight
    table, and re-aggregated per doc — one shuffle by doc_id that d58
    does not pay. At 100 TB you pick by model size: a formula or a
    few-MB table fits the d58/broadcast shape; a multi-GB embedding-
    table model forces this explode+join shape with the weight table
    bucketed on the join key. The weights here are the same
    (b % 2001) - 1000 ppm values as d58, so the two plans' scores are
    mutually checkable (test-pinned).

    Output grain differs from d58's verdict rollup: per (lang, score
    decile) counts — the calibration histogram a curation team reads to
    place a keep threshold.
    """
    docs = t(spark, sf, "documents")
    weights = (spark.range(_D59_BUCKETS)
               .select(F.col("id").alias("bucket"),
                       (F.col("id") % 2001 - 1000).alias("w_ppm")))
    from etl_docker_spark.plans.round6 import feats_sql

    # tokenize once per row, then explode the one materialized feature
    # array (same HOF-lambda re-split fix as d58's feated comment)
    feat = (docs.select("doc_id", "lang",
                        F.split(F.col("text"), " ").alias("tk"))
            .select("doc_id", "lang",
                    F.explode(F.expr(feats_sql("tk"))).alias("f"))
            .select("doc_id", "lang",
                    F.expr(f"pmod(CAST(conv(substring(md5(f), 1, 8), 16, "
                           f"10) AS BIGINT), {_D59_BUCKETS})")
                    .alias("bucket")))
    scored = (feat.join(F.broadcast(weights), "bucket")
              .groupBy("doc_id", "lang")
              .agg(F.count("*").cast("long").alias("n_feats"),
                   F.sum("w_ppm").cast("long").alias("sum_ppm")))
    score = F.expr("sum_ppm DIV n_feats") + F.lit(_D59_BIAS_PPM)
    per_doc = scored.select("lang", score.alias("score_ppm"))
    # decile over a FIXED ppm grid, clamped at both edges (see the
    # _D59_GRID_* comment for the range choice) — grid bucketing, not
    # rank bucketing, so it is embarrassingly parallel
    bucket = F.floor((F.col("score_ppm") - _D59_GRID_LO) * 10
                     / _D59_GRID_W)
    return (per_doc
            .withColumn("decile",
                        F.least(F.greatest(bucket, F.lit(0)), F.lit(9))
                        .cast("long"))
            .groupBy("lang", "decile")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("score_ppm").cast("long").alias("sum_score_ppm"))
            .orderBy("lang", "decile"))


D59_SQL = f"""
WITH w AS (
  SELECT i AS bucket, CAST(i % 2001 - 1000 AS BIGINT) AS w_ppm
  FROM (SELECT unnest(generate_series(0, {_D59_BUCKETS - 1})) AS i)
),
f AS (
  SELECT doc_id, lang,
         unnest(list_concat(
           string_split(text, ' '),
           list_transform(
             generate_series(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || '_'
                  || string_split(text, ' ')[i + 1]))) AS feat
  FROM documents
),
b AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5(feat), 1, 8) AS BIGINT)
           % {_D59_BUCKETS} AS bucket
  FROM f
),
s AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(w.w_ppm) AS BIGINT) AS sum_ppm
  FROM b JOIN w USING (bucket)
  GROUP BY doc_id, lang
),
p AS (
  SELECT lang, sum_ppm // n_feats + {_D59_BIAS_PPM} AS score_ppm FROM s
)
SELECT lang,
       CAST(least(greatest(
         floor((score_ppm - {_D59_GRID_LO}) * 10 / {_D59_GRID_W}), 0), 9)
         AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm
FROM p
GROUP BY lang, decile
ORDER BY lang, decile
"""

ROUND6C.update({
    "d59_classifier_weight_join": (d59_classifier_weight_join, D59_SQL),
})

# ---------------------------------------------------------------- q93


def q93_interval_battery(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI INTERVAL type battery — the typed time-arithmetic surface
    q85 (calendar/timezone parsing) does not touch: timestamp
    subtraction producing a DAY-TO-SECOND interval, SUM/MAX aggregation
    OVER the interval type itself (not over pre-extracted integers),
    component extraction from the aggregated interval, and year-month
    interval addition with end-of-month clamping.

    The oracle computes the same values by plain integer epoch
    arithmetic, so the gate pins that Spark's interval-typed path
    agrees exactly with integer math — the property that lets a
    pipeline mix both styles safely. The clamp battery pins that
    `date + INTERVAL 1 MONTH` clamps Jan-31 -> Feb-29-style on both
    engines (both clamp; engines that ERROR or roll over would fail
    the count).

    Scale shape: one lineitem-orders equi-join (the q03/q88 shuffle),
    per-row interval arithmetic inside the scan projection, and a
    5-key aggregate.
    """
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    iv = F.expr("l_shipdate - o_orderdate")  # INTERVAL DAY TO SECOND
    g = (j.select("o_orderpriority", iv.alias("iv"), "o_orderdate")
         .groupBy("o_orderpriority")
         .agg(F.count("*").cast("long").alias("n_lines"),
              F.sum("iv").alias("sum_iv"),
              F.max("iv").alias("max_iv"),
              F.sum(F.when(
                  F.dayofmonth(F.expr(
                      "o_orderdate + INTERVAL '1' MONTH"))
                  != F.dayofmonth("o_orderdate"), 1).otherwise(0))
              .cast("long").alias("n_month_clamped")))
    secs = ("CAST(extract(DAY FROM {c}) AS BIGINT) * 86400 "
            "+ CAST(extract(HOUR FROM {c}) AS BIGINT) * 3600 "
            "+ CAST(extract(MINUTE FROM {c}) AS BIGINT) * 60 "
            "+ CAST(floor(extract(SECOND FROM {c})) AS BIGINT)")
    return g.select(
        "o_orderpriority", "n_lines",
        F.expr(secs.format(c="sum_iv")).alias("total_gap_secs"),
        F.expr(secs.format(c="max_iv")).alias("max_gap_secs"),
        "n_month_clamped").orderBy("o_orderpriority")


Q93_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(epoch(l_shipdate) - epoch(o_orderdate)) AS BIGINT)
         AS total_gap_secs,
       CAST(MAX(epoch(l_shipdate) - epoch(o_orderdate)) AS BIGINT)
         AS max_gap_secs,
       CAST(COUNT(*) FILTER (
         day(o_orderdate + INTERVAL 1 MONTH) <> day(o_orderdate))
         AS BIGINT) AS n_month_clamped
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ROUND6C.update({
    "q93_interval_battery": (q93_interval_battery, Q93_SQL),
})

# ---------------------------------------------------------------- s29


def s29_changefeed_metrics_reconcile(spark: SparkSession,
                                     sf: str) -> DataFrame:
    """Two independent engine channels, one SQL truth: the per-batch
    state-churn LEDGER from the change feed (s27's source) reconciled
    against the progress-metrics API (s21's source,
    `stateOperators[].numRowsUpdated/numRowsRemoved`). A state-store
    capacity model is only trustworthy if the metrics a dashboard
    scrapes agree with what the store actually committed — this gates
    that agreement row by row, and gates BOTH against the oracle's
    arithmetic (keys touched per day-batch; windows evictable at
    end of stream).

    Output: one row per file batch with the update count from each
    channel, plus the stream-total delete/remove counts from each
    channel (eviction BATCH ids are machinery timing — the totals are
    the data-determined invariant). All four channels must equal the
    oracle's counts, which are plain GROUP BYs over the staged feed.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (scoped_conf,
                                              stream_state_partitions)
    from etl_docker_spark.plans.round6b import _stage_daily_arrivals

    work = tempfile.mkdtemp(prefix="s29_")
    try:
        arrivals = _stage_daily_arrivals(spark, sf, work)
        probe = spark.read.parquet(arrivals)
        n_days = len(os.listdir(arrivals))
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.withWatermark("ts", "1 minute")
               .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
               .agg(F.count("*").cast("long").alias("n_events")))
        ckpt = os.path.join(work, "ckpt")
        changelog_key = ("spark.sql.streaming.stateStore.rocksdb."
                         "changelogCheckpointing.enabled")
        # track_rows: the reconcile gate reads numRowsUpdated/Removed;
        # keep row tracking exact rather than relying on the untracked
        # fast path's metric semantics
        with stream_state_partitions(spark, 4, track_rows=True), \
                scoped_conf(spark, changelog_key, "true"):
            q = (agg.writeStream.outputMode("append").format("noop")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            finished = q.awaitTermination(300)
            if not finished:
                q.stop()
                raise RuntimeError(
                    "s29: availableNow run did not terminate within "
                    "300 s; refusing to reconcile a partial run")
            progress = [p for p in q.recentProgress if p is not None]
            q.stop()
            feed = (spark.read.format("statestore")
                    .option("readChangeFeed", "true")
                    .option("changeStartBatchId", "0")
                    .load(ckpt)
                    .select("batch_id", "change_type")
                    .localCheckpoint())

        metrics = {}
        removed_total = 0
        for p in progress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            metrics[int(p["batchId"])] = int(ops[0]["numRowsUpdated"])
            removed_total += int(ops[0]["numRowsRemoved"])
        mrows = [(b, n) for b, n in sorted(metrics.items()) if b < n_days]
        mdf = spark.createDataFrame(
            mrows, "batch_id long, metric_updates long")

        upd = F.col("change_type") == "update"
        fdf = (feed.filter(F.col("batch_id") < n_days)
               .groupBy("batch_id")
               .agg(F.sum(F.when(upd, 1).otherwise(0)).cast("long")
                    .alias("feed_updates")))
        feed_deletes = (feed.filter(F.col("change_type") == "delete")
                        .count())
        return (fdf.join(mdf, "batch_id")
                .withColumn("total_feed_deletes",
                            F.lit(feed_deletes).cast("long"))
                .withColumn("total_metric_removed",
                            F.lit(removed_total).cast("long"))
                .orderBy("batch_id"))
    finally:
        shutil.rmtree(work, ignore_errors=True)


_S29_CUTOFF = "2024-01-11"

S29_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, ts
  FROM events WHERE ts < TIMESTAMP '{_S29_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev),
idx AS (
  SELECT day, CAST(dense_rank() OVER (ORDER BY day) - 1 AS BIGINT) AS di
  FROM (SELECT DISTINCT day FROM ev)
),
keys AS (SELECT DISTINCT day, event_type FROM ev),
closed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM keys, wm WHERE day + INTERVAL 1 DAY <= wm.w
)
SELECT i.di AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS feed_updates,
       CAST(COUNT(*) AS BIGINT) AS metric_updates,
       (SELECT n FROM closed) AS total_feed_deletes,
       (SELECT n FROM closed) AS total_metric_removed
FROM keys k JOIN idx i ON i.day = k.day
GROUP BY i.di
ORDER BY i.di
"""

ROUND6C.update({
    "s29_changefeed_metrics_reconcile": (s29_changefeed_metrics_reconcile,
                                         S29_SQL),
})

# ---------------------------------------------------------------- e24

_E24_SHORT = 16  # Hamming-ranked survivors per query within the cell
_E24_K = 5


def e24_ivf_binary_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Three-stage serving FUNNEL — trained IVF cell routing (e05/e06),
    binary-signature Hamming ranking within the cell (e23), exact cosine
    only for the survivors: coarse -> cheap -> exact, each stage cutting
    the candidate set before the next pays more per candidate. This is
    the composition production vector serving actually deploys (route to
    a shard, scan packed bits, rerank few) — the single-stage family
    members gate each mechanism; this gates their interaction, including
    the rank bookkeeping needed to audit which stage lost a neighbor.

    Scale shape: stage 1 is an equi-join on the memoized assignment
    frame (train-once artifact, e05's story); stage 2 carries
    (query_id, neighbor_id, hamming) — 24 bytes — per in-cell candidate;
    stage 3 rejoins raw vectors for <= 16 x n_queries rows. Nothing
    corpus-sized crosses a stage boundary except the in-cell signature
    scan, which is 8 bytes/vector.
    """
    from pyspark.sql import Window

    from etl_docker_spark.llm.similarity import cosine_expr
    from etl_docker_spark.plans._util import ensure_session_confs
    from etl_docker_spark.plans.round2 import e05_assignments
    from etl_docker_spark.plans.round6 import sig_half

    ensure_session_confs(spark)
    assign = e05_assignments(spark, sf)
    emb = t(spark, sf, "embeddings")
    sigs = (emb.select("vec_id", sig_half(0).alias("lo"),
                       sig_half(32).alias("hi"))
            .join(assign, "vec_id"))
    q = (sigs.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("lo").alias("qlo"), F.col("hi").alias("qhi"),
                 "cluster"))
    ham = (F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
           + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))).cast("long")
    wq = Window.partitionBy("query_id")
    short = (sigs.join(F.broadcast(q), "cluster")
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     ham.alias("hamming"))
             .withColumn("ham_rank", F.row_number().over(
                 wq.orderBy(F.asc("hamming"), F.asc("neighbor_id")))
                 .cast("long"))
             .filter(F.col("ham_rank") <= _E24_SHORT))
    qv = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nv"))
    exact = (short.join(nv, "neighbor_id")
             .join(F.broadcast(qv), "query_id")
             .select("query_id", "neighbor_id", "hamming", "ham_rank",
                     cosine_expr(F.col("nv"), F.col("qv")).alias("cos_raw")))
    return (exact.withColumn("exact_rank", F.row_number().over(
        wq.orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("exact_rank") <= _E24_K)
        .select("query_id", "neighbor_id",
                F.round("cos_raw", 8).alias("cosine"),
                "exact_rank", "hamming", "ham_rank"))


def _e24_sql() -> str:
    from etl_docker_spark.plans.round2 import E05_SQL, _DOT2
    from etl_docker_spark.plans.round6 import _E23_HALF

    body = E05_SQL.strip().removeprefix("WITH")
    assign_ctes = body.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()
    return f"""
WITH {assign_ctes},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
sig AS (
  SELECT s.vec_id, s.embedding, a.cluster,
         {_E23_HALF.format(lo=0)} AS lo,
         {_E23_HALF.format(lo=32)} AS hi
  FROM (SELECT vec_id, embedding FROM embeddings) s
  JOIN assign a USING (vec_id)
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, lo AS qlo, hi AS qhi, cluster
  FROM sig WHERE vec_id < 8
),
cand AS (
  SELECT q.query_id, s.vec_id AS neighbor_id, s.embedding AS nv, q.qv,
         CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
              AS BIGINT) AS hamming
  FROM sig s JOIN q ON s.cluster = q.cluster AND s.vec_id <> q.query_id
),
short AS (
  SELECT query_id, neighbor_id, nv, qv, hamming,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, neighbor_id ASC)
              AS BIGINT) AS ham_rank
  FROM cand
  QUALIFY ham_rank <= {_E24_SHORT}
),
exact AS (
  SELECT query_id, neighbor_id, hamming, ham_rank,
         {_DOT2.format(a='nv', b='qv')}
           / sqrt({_DOT2.format(a='nv', b='nv')}
                  * {_DOT2.format(a='qv', b='qv')}) AS cos_raw
  FROM short
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS exact_rank,
       hamming, ham_rank
FROM exact
QUALIFY exact_rank <= {_E24_K}
"""


ROUND6C.update({
    "e24_ivf_binary_funnel": (e24_ivf_binary_funnel, _e24_sql()),
})
