"""Round-4c queries: chained streaming aggregation, full-outer
stream-stream join, positional-filter Jaccard, exact substring-run
dedup, ORC round-trip, schema evolution, base+delta ANN serving.

Same determinism discipline as every other plan module: money in integer
cents, integer outputs pinned BIGINT, identical column names both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dec, t

ROUND4C: dict = {}

# ---------------------------------------------------------------- s19

_S19_CUTOFF = "2024-01-11"


def s19_stream_chained_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """CHAINED streaming aggregations (multiple stateful operators in one
    query, Spark 3.4+): an hourly windowed aggregate feeding a daily
    windowed aggregate over `window_time` — the streaming form of every
    warehouse's rollup cascade (raw -> hourly -> daily), run as ONE
    query so the hourly tier never lands on storage.

    What the chain adds over s01's single agg: the daily operator's
    input is the hourly operator's APPEND output, so correctness needs
    (a) the hourly tier to emit each hour exactly once as the watermark
    closes it, and (b) the daily tier to treat those emissions as event
    time (`window_time(hw)`) under the SAME watermark. `n_hours` — the
    count of hourly rows absorbed per day — is the witness that the
    intermediate tier really existed (a single-agg rewrite can't
    produce it without a second shuffle over raw rows; here the daily
    state sees only ~24 rows/key/day regardless of raw volume — the
    100 TB argument for chaining inside the engine).

    Emission, pinned by prototype (day-batched feed, availableNow, same
    one-batch watermark lag as s13-s18): a daily window emits iff
    day_end <= final watermark (max event ts - 1 min); day-aligned
    windows mean every hourly window inside an emitted day has closed
    too, so the gated output equals the batch rollup over days 1..9 and
    the last day stays open (s15's open-session discipline).
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import stream_state_partitions

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S19_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s19_")
    try:
        staged = os.path.join(work, "staged")
        ev.coalesce(1).write.partitionBy("dcol").mode("overwrite") \
            .parquet(staged)
        arrivals = os.path.join(work, "arrivals")
        os.makedirs(arrivals)
        days = sorted(d for d in os.listdir(staged) if d.startswith("dcol="))
        for i, d in enumerate(days):
            src_dir = os.path.join(staged, d)
            src = next(f for f in os.listdir(src_dir)
                       if f.endswith(".parquet"))
            dst = os.path.join(arrivals, f"{i:03d}.parquet")
            shutil.copyfile(os.path.join(src_dir, src), dst)
            os.utime(dst, (1700000000 + i * 60,) * 2)

        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        hourly = (stream.withWatermark("ts", "1 minute")
                  .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
                  .agg(F.count("*").cast("long").alias("n_events"),
                       F.sum("cents").alias("cents")))
        daily = (hourly
                 .groupBy(F.window(F.window_time("hw"), "1 day").alias("dw"),
                          "event_type")
                 .agg(F.count("*").cast("long").alias("n_hours"),
                      F.sum("n_events").cast("long").alias("n_events"),
                      F.sum("cents").cast("long").alias("total_cents"))
                 .select(F.col("dw.start").alias("day"), "event_type",
                         "n_hours", "n_events", "total_cents"))
        name = f"s19_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (daily.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S19_SQL = f"""
WITH ev AS (
  SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hr,
         event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents, ts
  FROM events WHERE ts < TIMESTAMP '{_S19_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev),
hourly AS (
  SELECT day, hr, event_type, COUNT(*) AS n_events, SUM(cents) AS cents
  FROM ev GROUP BY day, hr, event_type
)
SELECT CAST(h.day AS TIMESTAMP) AS day, h.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(h.n_events) AS BIGINT) AS n_events,
       CAST(SUM(h.cents) AS BIGINT) AS total_cents
FROM hourly h, wm
WHERE h.day + INTERVAL 1 DAY <= wm.w
GROUP BY h.day, h.event_type
"""


ROUND4C.update({
    "s19_stream_chained_aggs": (s19_stream_chained_aggs, S19_SQL),
})

# ---------------------------------------------------------------- s20


def s20_stream_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both null-emission rules
    in one gate (s17 pins only the left side). Production meaning: in
    one pass, views that never converted AND purchases with no
    preceding view (direct/attribution-less conversions) — the two
    audit queries every funnel pipeline runs, emitted from one join
    state instead of two scans.

    Emission rules, pinned by prototype (synthetic boundary feed,
    availableNow, one-batch watermark lag; final watermark = MIN over
    both sides of max event ts - 1 min):

      - matched rows emit as they match (independent of watermark);
      - an unmatched VIEW emits its null row iff
        view_ts + 6h < wm, STRICT (s17's rule — the boundary view at
        exactly wm - 6h stays in state);
      - an unmatched PURCHASE emits its null row iff buy_ts < wm,
        STRICT (pinned: buys at wm-2h/wm-1h emitted, the buy at
        exactly wm held) — its match window is views in
        [buy_ts - 6h, buy_ts], so eviction needs only the watermark to
        pass buy_ts itself, not the 6h horizon.

    Rows the final no-data batch leaves open never appear — at 100 TB
    the watermark is the only bound on both sides' join state.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    ev = _events_stream(spark, sf)
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "1 minute"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", "1 minute"))
    joined = (views.join(
        buys,
        F.expr("""v_user = b_user
                  AND buy_ts >= view_ts
                  AND buy_ts <= view_ts + interval 6 hours"""),
        "fullOuter")
        .select(F.coalesce("v_user", "b_user").alias("user_id"),
                "view_id", "purchase_id",
                (F.unix_micros("buy_ts") - F.unix_micros("view_ts"))
                .alias("delta_us")))
    name = f"s20_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name).localCheckpoint()


S20_SQL = """
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS vts
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT user_id AS bu, event_id AS purchase_id, ts AS bts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT MAX(vts) FROM v), (SELECT MAX(bts) FROM b))
         - INTERVAL 1 MINUTE AS w
),
matched AS (
  SELECT v.user_id, v.view_id, b.purchase_id,
         epoch_us(b.bts) - epoch_us(v.vts) AS delta_us
  FROM v JOIN b ON v.user_id = b.bu
   AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR
),
unmatched_v AS (
  SELECT v.user_id, v.view_id,
         CAST(NULL AS BIGINT) AS purchase_id,
         CAST(NULL AS BIGINT) AS delta_us
  FROM v, wm
  WHERE v.vts + INTERVAL 6 HOUR < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM b
      WHERE b.bu = v.user_id
        AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR)
),
unmatched_b AS (
  SELECT b.bu AS user_id, CAST(NULL AS BIGINT) AS view_id, b.purchase_id,
         CAST(NULL AS BIGINT) AS delta_us
  FROM b, wm
  WHERE b.bts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM v
      WHERE v.user_id = b.bu
        AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR)
)
SELECT * FROM matched
UNION ALL SELECT * FROM unmatched_v
UNION ALL SELECT * FROM unmatched_b
"""


ROUND4C.update({
    "s20_stream_full_outer_join": (s20_stream_full_outer_join, S20_SQL),
})

# ---------------------------------------------------------------- d49


def d49_positional_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.7 pairs via prefix + POSITIONAL
    filtering (PPJoin, Xiao et al. WWW'08) — d47's documented upgrade
    path, gated at the tighter threshold where the positional bound has
    teeth (at t=0.7 prefixes are ~30% of each set, and most
    prefix-collision pairs fail the first-match position bound before
    the verification joins ever run; measured reduction table in
    SCALE.md). Zero false negatives by construction: the filter only
    discards candidates whose overlap upper bound is below the Jaccard
    minoverlap, so output == the brute-force join (the oracle).

    See `llm/dedup.py:prefix_filter_jaccard_pairs(positional=True)` for
    the order-consistency argument that makes the classic single-node
    bound computable as a distributed per-pair MIN."""
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        t_num=7, t_den=10, positional=True)


from etl_docker_spark.plans.round4b import _D47_HASHED_CTES  # noqa: E402

D49_SQL = f"""
WITH {_D47_HASHED_CTES},
hs AS (SELECT doc_id, list_distinct(hh) AS hs FROM hashed),
tok AS (SELECT doc_id, unnest(hs) AS h FROM hs),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter_n
  FROM tok a JOIN tok b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter_n,
       CAST(len(sa.hs) + len(sb.hs) AS BIGINT) - p.inter_n AS union_n
FROM pair p
JOIN hs sa ON sa.doc_id = p.doc_a
JOIN hs sb ON sb.doc_id = p.doc_b
WHERE 10 * p.inter_n >= 7 * (len(sa.hs) + len(sb.hs) - p.inter_n)
"""


ROUND4C.update({
    "d49_positional_jaccard": (d49_positional_jaccard, D49_SQL),
})

# ---------------------------------------------------------------- d50


def d50_substring_runs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact shared-substring audit: document pairs sharing a contiguous
    run of >= 8 tokens, with the longest shared run and total 5-gram
    match volume per pair — the EXACT-SUBSTRING dedup family (Lee et
    al. '22) next to set-Jaccard (d47/d49): set similarity can't see
    that two long documents share one verbatim paragraph (Jaccard is
    diluted by the unshared remainder); substring runs are exactly that
    signal, and at training-data scale verbatim-paragraph contamination
    is what leaks benchmarks. See
    `llm/dedup.py:substring_run_pairs` for the diagonal-streak method
    and the boilerplate-gram scale hazard."""
    from etl_docker_spark.llm.dedup import substring_run_pairs

    return substring_run_pairs(
        t(spark, sf, "documents"), "doc_id", "text", k=5, min_run=8)


D50_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
g AS (
  SELECT doc_id, i AS p,
         CAST('0x' || substring(
           md5(array_to_string(tk[i:i+4], ' ')), 1, 8) AS BIGINT) AS h
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 4)) AS u(i)
  WHERE len(tk) >= 5
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, a.p - b.p AS d
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
),
r AS (
  SELECT doc_a, doc_b, d, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, d
                                 ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, d, grp, COUNT(*) AS s
  FROM r GROUP BY doc_a, doc_b, d, grp
)
SELECT doc_a, doc_b,
       CAST(MAX(s) + 4 AS BIGINT) AS max_run_tokens,
       CAST(SUM(s) AS BIGINT) AS n_gram_matches
FROM runs GROUP BY doc_a, doc_b
HAVING MAX(s) + 4 >= 8
"""


ROUND4C.update({
    "d50_substring_runs": (d50_substring_runs, D50_SQL),
})

# ---------------------------------------------------------------- q75

_Q75_CUTOFF = "2024-01-11"


def q75_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """ORC round-trip with pushdown, gated end-to-end through disk —
    the second columnar format next to parquet (warehouses routinely
    read Hive-era ORC lakes; an engine claiming format coverage must
    prove value parity THROUGH its write+read path, not just accept the
    reader's output). The read back applies a partition filter
    (event_type, pruned at planning) and a value filter (cents, pushed
    into the ORC reader as a search argument) — `tests/test_round4c.py`
    pins both on this exact frame; this gate pins that what survives
    the pruned, pushed scan aggregates to the same numbers as the
    logical query (the oracle never sees ORC)."""
    import shutil
    import tempfile

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_Q75_CUTOFF).cast("timestamp"))
          .select("event_id", "event_type", "user_id",
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("day"),
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))
    work = tempfile.mkdtemp(prefix="q75_")
    try:
        ev.write.mode("overwrite").partitionBy("event_type").orc(work)
        back = (spark.read.orc(work)
                .filter(F.col("event_type").isin("purchase", "view")
                        & (F.col("cents") >= 1000)))
        return (back.groupBy("day", "event_type")
                .agg(F.count("*").cast("long").alias("n_events"),
                     F.sum("cents").cast("long").alias("total_cents"),
                     F.countDistinct("user_id").cast("long")
                     .alias("n_users"))
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q75_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE ts < TIMESTAMP '{_Q75_CUTOFF} 00:00:00'
  AND event_type IN ('purchase', 'view')
  AND CAST(round(value * 100, 0) AS BIGINT) >= 1000
GROUP BY day, event_type
"""


ROUND4C.update({
    "q75_orc_roundtrip": (q75_orc_roundtrip, Q75_SQL),
})

# ---------------------------------------------------------------- q76

_Q76_CUTOFF = "1999-01-01"


def q76_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION gated through disk: a table whose early
    files predate a column (orders loaded before {_Q76_CUTOFF} lack
    o_orderpriority — the column was added to the feed later), read
    back with mergeSchema so old files surface NULL for the new column
    — the add-a-column lifecycle every long-lived lake table goes
    through (at 100 TB you never rewrite history to add a column; the
    reader reconciles footers). The aggregate buckets legacy rows under
    'LEGACY' via coalesce, so a reader that dropped v1 files, failed to
    merge footers, or back-filled the column wrongly diverges from the
    oracle."""
    import shutil
    import tempfile

    orders = t(spark, sf, "orders")
    cut = F.lit(_Q76_CUTOFF).cast("timestamp")
    v1 = (orders.filter(F.col("o_orderdate") < cut)
          .select("o_orderkey",
                  (dec("o_totalprice") * 100).cast("long")
                  .alias("total_cents")))
    v2 = (orders.filter(F.col("o_orderdate") >= cut)
          .select("o_orderkey",
                  (dec("o_totalprice") * 100).cast("long")
                  .alias("total_cents"),
                  "o_orderpriority"))
    work = tempfile.mkdtemp(prefix="q76_")
    try:
        v1.write.mode("overwrite").parquet(work)
        v2.write.mode("append").parquet(work)
        merged = spark.read.option("mergeSchema", "true").parquet(work)
        return (merged
                .groupBy(F.coalesce("o_orderpriority", F.lit("LEGACY"))
                         .alias("priority"))
                .agg(F.count("*").cast("long").alias("n_orders"),
                     F.sum("total_cents").cast("long").alias("total_cents"))
                .orderBy("priority")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q76_SQL = f"""
SELECT CASE WHEN o_orderdate >= TIMESTAMP '{_Q76_CUTOFF} 00:00:00'
            THEN o_orderpriority ELSE 'LEGACY' END AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders
GROUP BY priority
ORDER BY priority
"""


ROUND4C.update({
    "q76_schema_evolution": (q76_schema_evolution, Q76_SQL),
})

# ---------------------------------------------------------------- e21

_E21_MOD, _E21_REM = 11, 9  # delta segment: vec_id % 11 == 9 (excludes 0..7)


def e21_base_delta_serving(spark: SparkSession, sf: str) -> DataFrame:
    """ANN serving over BASE + DELTA segments — how a production vector
    index absorbs streaming inserts without retraining: the trained IVF
    (e05's trainer, run on the base segment only) routes queries to
    cells of BASE; vectors that arrived after training sit in a small
    untrained DELTA segment that every query brute-force scans; the
    exact cosine top-k merges both candidate streams. Periodic
    compaction folds delta into base and retrains — until then, recall
    on fresh vectors is exact by construction (the delta scan misses
    nothing) and the extra cost is |delta| per query, which is what
    bounds the retrain cadence at 100 TB.

    The `segment` column witnesses delta rows actually being served
    through the merged ranking (an implementation that forgot the delta
    side would differ from the oracle wherever a fresh vector belongs
    in a top-5)."""
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.llm.similarity import dot_expr, norm2_expr
    from etl_docker_spark.plans._util import ensure_session_confs
    from etl_docker_spark.plans.round2 import _KM_K, _KM_Q, _ivf_train_on

    ensure_session_confs(spark)
    emb = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm2_expr(F.col("embedding")).alias("n2"))
    is_delta = F.col("vec_id") % _E21_MOD == _E21_REM

    def train():
        e_q = (t(spark, sf, "embeddings").filter(~is_delta)
               .select("vec_id",
                       F.transform("embedding",
                                   lambda x: F.floor(x.cast("double")
                                                     * _KM_Q).cast("long"))
                       .alias("qv")))
        return _ivf_train_on(e_q)

    assign = memo_frame(spark, f"e21_assign:{sf}", train, sf_dir=sf)
    base = emb.filter(~is_delta).join(assign, "vec_id")
    delta = emb.filter(is_delta)
    q = (base.filter(F.col("vec_id") < _KM_K)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("n2").alias("qn2"), "cluster"))
    cand_base = (base.join(F.broadcast(q), "cluster")
                 .filter(F.col("vec_id") != F.col("query_id"))
                 .select("query_id", F.col("vec_id").alias("neighbor_id"),
                         F.lit("base").alias("segment"),
                         "qv", "qn2", "embedding", "n2"))
    cand_delta = (delta.crossJoin(F.broadcast(q.drop("cluster")))
                  .select("query_id", F.col("vec_id").alias("neighbor_id"),
                          F.lit("delta").alias("segment"),
                          "qv", "qn2", "embedding", "n2"))
    scored = (cand_base.unionByName(cand_delta)
              .select("query_id", "neighbor_id", "segment",
                      (dot_expr(F.col("qv"), F.col("embedding"))
                       / F.sqrt(F.col("qn2") * F.col("n2")))
                      .alias("cosine")))

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "segment",
                    F.round("cosine", 8).alias("cosine"), "rank"))


def _e21_sql() -> str:
    """Oracle: e05's training CTE body restricted to the base segment
    (string-level reuse keeps the two k-means replays in lockstep),
    then the merged base-cell + delta-scan ranking."""
    from etl_docker_spark.plans.round2 import _DOT2, _KM_K, E05_SQL

    base_filter = f"WHERE vec_id % {_E21_MOD} <> {_E21_REM}"
    body = E05_SQL.strip().removeprefix("WITH").replace(
        "FROM embeddings\n)", f"FROM embeddings {base_filter}\n)", 1)
    train = body.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()
    return f"""
WITH {train},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
emb AS (
  SELECT vec_id, embedding, {_DOT2.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
base AS (
  SELECT emb.*, assign.cluster FROM emb JOIN assign USING (vec_id)
),
delta AS (
  SELECT * FROM emb WHERE vec_id % {_E21_MOD} = {_E21_REM}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, n2 AS qn2, cluster
  FROM base WHERE vec_id < {_KM_K}
),
cand AS (
  SELECT q.query_id, b.vec_id AS neighbor_id, 'base' AS segment,
         q.qv, q.qn2, b.embedding, b.n2
  FROM base b JOIN q ON b.cluster = q.cluster AND b.vec_id <> q.query_id
  UNION ALL
  SELECT q.query_id, d.vec_id, 'delta', q.qv, q.qn2, d.embedding, d.n2
  FROM delta d, q
),
scored AS (
  SELECT query_id, neighbor_id, segment,
         {_DOT2.format(a='qv', b='embedding')} / sqrt(qn2 * n2) AS cos_raw
  FROM cand
)
SELECT query_id, neighbor_id, segment, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
"""


ROUND4C.update({
    "e21_base_delta_serving": (e21_base_delta_serving, _e21_sql()),
})
