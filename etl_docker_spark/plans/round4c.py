"""Round-4c queries: chained streaming aggregation, full-outer
stream-stream join, state accounting, update mode, join-then-agg,
positional-filter Jaccard, exact substring-run dedup + decontamination,
ORC/XML round-trips, schema evolution, LATERAL, observe() metrics,
null-safe join, correlated aggregate subqueries, SQL UDFs, collations,
base+delta ANN serving.

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
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S19_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s19_")
    try:
        arrivals = stage_day_files(ev, work)
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

# ---------------------------------------------------------------- q77


def q77_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    Spark 3.4+): top-3 customers by balance PER NATION, written the way
    an analyst writes it — a per-row correlated ORDER BY ... LIMIT —
    rather than the window-function rewrite (q03/q07 cover that form).
    Catalyst decorrelates this into a ranked window under the hood
    (DomainJoin rewrite), so the declarative form pays the same
    distributed plan as the hand-rewrite: no per-nation driver loop, no
    N scans of customer. The oracle runs the IDENTICAL lateral SQL on
    DuckDB — both engines' decorrelation must agree on the semantics
    (ties broken by name, nations with < 3 customers keep what they
    have, nations with none drop out)."""
    t(spark, sf, "nation").createOrReplaceTempView("q77_nation")
    t(spark, sf, "customer").createOrReplaceTempView("q77_customer")
    return spark.sql("""
SELECT n.n_name, c.c_name,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents
FROM q77_nation n,
LATERAL (SELECT c_name, c_acctbal FROM q77_customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 3) c
""")


Q77_SQL = """
SELECT n.n_name, c.c_name,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 3) c
"""


ROUND4C.update({
    "q77_lateral_topk": (q77_lateral_topk, Q77_SQL),
})

# ---------------------------------------------------------------- d51

_D51_MOD = 13  # benchmark slice: doc_id % 13 == 0


def d51_substring_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark DECONTAMINATION by exact substring overlap — the
    production form of d50: a held-out benchmark slice (doc_id %
    {_D51_MOD} == 0) is screened against the training corpus, and any
    training document sharing a contiguous >= 8-token run with a
    benchmark document is flagged for ejection (one row per flagged
    training doc: the worst offending benchmark doc and the longest
    run). Verbatim-run overlap is the decontamination criterion the
    dedup-training-data line of work actually ships — set-level Jaccard
    (d19/d43's screens) misses a benchmark answer pasted into a long
    document, which is precisely the leak that inflates evals.

    Composition: d50's diagonal-streak pair detector, post-filtered to
    BIPARTITE pairs (exactly one endpoint in the benchmark slice), then
    a max_by per training doc. Runs within either slice are ignored —
    dedup inside the corpus is d14's job, not decontamination's."""
    from etl_docker_spark.llm.dedup import substring_run_pairs

    pairs = substring_run_pairs(
        t(spark, sf, "documents"), "doc_id", "text", k=5, min_run=8)
    a_bench = F.col("doc_a") % _D51_MOD == 0
    b_bench = F.col("doc_b") % _D51_MOD == 0
    cross = (pairs.filter(a_bench != b_bench)
             .select(F.when(a_bench, F.col("doc_b"))
                     .otherwise(F.col("doc_a")).alias("train_doc"),
                     F.when(a_bench, F.col("doc_a"))
                     .otherwise(F.col("doc_b")).alias("bench_doc"),
                     "max_run_tokens"))
    from pyspark.sql import Window

    w = Window.partitionBy("train_doc").orderBy(
        F.desc("max_run_tokens"), F.asc("bench_doc"))
    return (cross.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("train_doc", "bench_doc", "max_run_tokens"))


def _d51_sql() -> str:
    body = D50_SQL.strip().removeprefix("WITH")
    pairs = body.rsplit("SELECT doc_a, doc_b,", 1)[0].strip()
    return f"""
WITH {pairs},
pair_runs AS (
  SELECT doc_a, doc_b, CAST(MAX(s) + 4 AS BIGINT) AS max_run_tokens
  FROM runs GROUP BY doc_a, doc_b
  HAVING MAX(s) + 4 >= 8
),
cross_pairs AS (
  SELECT CASE WHEN doc_a % {_D51_MOD} = 0 THEN doc_b ELSE doc_a END
           AS train_doc,
         CASE WHEN doc_a % {_D51_MOD} = 0 THEN doc_a ELSE doc_b END
           AS bench_doc,
         max_run_tokens
  FROM pair_runs
  WHERE (doc_a % {_D51_MOD} = 0) <> (doc_b % {_D51_MOD} = 0)
)
SELECT train_doc, bench_doc, max_run_tokens
FROM cross_pairs
QUALIFY row_number() OVER (PARTITION BY train_doc
                           ORDER BY max_run_tokens DESC, bench_doc ASC) = 1
"""


ROUND4C.update({
    "d51_substring_decontam": (d51_substring_decontam, _d51_sql()),
})

# ---------------------------------------------------------------- q78

_Q78_CUTOFF = "2024-01-11"


def q78_observed_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass dataset metrics via `Observation` — Spark's
    accumulator-backed observe() API: the metrics are collected DURING
    the one write pass (map-side, merged on the driver), not by a
    second scan. This is how a 100 TB load job gets its row counts and
    value ranges for the audit log for free — the A5/A6
    count-verification contract (`orchestration.py`) without paying the
    input twice. The gate pins that the observed numbers equal the
    oracle's recomputation over the same filter — an observation
    attached to the wrong frame (pre-filter, post-aggregate) or merged
    lossily diverges.

    The returned frame is built from the observation result (scalar
    frame, same pattern as q69's audit-trail gate); the data pass
    itself lands in a throwaway parquet sink, exactly like the
    production job it models."""
    import shutil
    import tempfile

    from pyspark.sql import Observation

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_Q78_CUTOFF).cast("timestamp"))
          .select("event_id", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))
    obs = Observation("q78_metrics")
    tagged = ev.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
        F.count(F.when(F.col("event_type") == "error", 1)).cast("long")
        .alias("n_errors"))
    work = tempfile.mkdtemp(prefix="q78_")
    try:
        tagged.write.mode("overwrite").parquet(work)  # the single pass
    finally:
        shutil.rmtree(work, ignore_errors=True)
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_cents"], m["min_cents"], m["max_cents"],
          m["n_errors"])],
        "n_rows long, total_cents long, min_cents long, max_cents long, "
        "n_errors long")


Q78_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(MIN(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS n_errors
FROM events
WHERE ts < TIMESTAMP '{_Q78_CUTOFF} 00:00:00'
"""


ROUND4C.update({
    "q78_observed_metrics": (q78_observed_metrics, Q78_SQL),
})

# ---------------------------------------------------------------- s21

_S21_CUTOFF = "2024-01-11"


def s21_stream_state_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """STATE-SIZE accounting via StreamingQueryProgress, gated — the
    observability contract capacity planning runs on: after an
    availableNow run of a day-windowed aggregate, the state store must
    hold EXACTLY the open windows (groups whose window end outlives the
    final watermark) and the sink exactly the closed ones. At 100 TB
    `numRowsTotal` is the number you alert on — if eviction lags the
    watermark (state leak) or runs ahead of it (dropped results), this
    gate diverges from the oracle's open/closed split.

    Pinned by prototype: the final no-data batch evicts every closed
    window it emits, so lastProgress.stateOperators[0].numRowsTotal ==
    open (day x event_type) groups; emitted sink rows == closed groups.
    (RocksDB and HDFS providers agree — provider-independence is the
    same claim tests/test_streaming_rocksdb.py pins for the s-family.)
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S21_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s21_")
    try:
        arrivals = stage_day_files(ev, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.withWatermark("ts", "1 minute")
               .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
               .agg(F.count("*").cast("long").alias("n_events")))
        name = f"s21_sink_{abs(hash(sf)) % 10 ** 8}"
        # track_rows: this query GATES numRowsTotal — keep the exact
        # state-row metric despite its per-commit counting cost
        with stream_state_partitions(spark, 4, track_rows=True):
            q = (agg.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            state_rows = None
            for p in reversed(q.recentProgress):
                if p["stateOperators"]:
                    state_rows = int(p["stateOperators"][0]["numRowsTotal"])
                    break
            q.stop()
        emitted = spark.table(name).count()
        return spark.createDataFrame(
            [(state_rows, emitted)],
            "n_open_state_rows long, n_closed_emitted long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


S21_SQL = f"""
WITH ev AS (
  SELECT date_trunc('day', ts) AS day, event_type, ts
  FROM events WHERE ts < TIMESTAMP '{_S21_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev),
groups AS (SELECT DISTINCT day, event_type FROM ev)
SELECT
  CAST((SELECT COUNT(*) FROM groups g, wm
        WHERE g.day + INTERVAL 1 DAY > wm.w) AS BIGINT)
    AS n_open_state_rows,
  CAST((SELECT COUNT(*) FROM groups g, wm
        WHERE g.day + INTERVAL 1 DAY <= wm.w) AS BIGINT)
    AS n_closed_emitted
"""


ROUND4C.update({
    "s21_stream_state_accounting": (s21_stream_state_accounting, S21_SQL),
})

# ---------------------------------------------------------------- s22

_S22_CUTOFF = "2024-01-11"


def s22_stream_update_mode(spark: SparkSession, sf: str) -> DataFrame:
    """UPDATE output mode, gated — every other s-query appends; update
    mode is the dashboard-serving contract (upsert the changed keys
    each micro-batch, emit nothing for quiet keys). The foreachBatch
    sink records per-batch emissions; the gate pins, per key:

      - n_updates: the number of batches that emitted the key — update
        mode must emit a key exactly in the batches where its aggregate
        CHANGED (here: the days the key received events, under the
        deterministic one-file-per-day feed), never in quiet batches
        and never in the final no-data batch (an unwatermarked groupBy
        holds state but has nothing new to say);
      - the final emitted values, which must equal the batch aggregate
        (the last upsert a downstream store would hold).

    An engine that re-emitted all keys every batch (complete-mode
    semantics leaking into update) or missed a changed key diverges in
    n_updates; a state bug diverges in the finals."""
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S22_CUTOFF).cast("timestamp"))
          .select("ts", (F.col("user_id") % 10).alias("bucket"),
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s22_")
    try:
        arrivals = stage_day_files(ev, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.groupBy("bucket")
               .agg(F.count("*").cast("long").alias("n_events"),
                    F.sum("cents").alias("total_cents")))
        emissions: list[tuple] = []

        def sink(batch_df, batch_id):
            # the ONLY collect() in the package: a foreachBatch RECORDER
            # for the emission-timing gate, bounded at |keys| = 10 rows
            # per batch by construction (user_id % 10) — it observes the
            # sink protocol, it is not on any data path
            emissions.extend(
                (r["bucket"], r["n_events"], r["total_cents"])
                for r in batch_df.collect())

        with stream_state_partitions(spark, 4):
            q = (agg.writeStream.outputMode("update").foreachBatch(sink)
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        # per key: emission count + the last (= largest n_events) upsert
        per_key: dict[int, tuple[int, int, int]] = {}
        for bucket, n, tc in emissions:  # batches arrive in order
            prev = per_key.get(bucket)
            per_key[bucket] = (prev[0] + 1 if prev else 1, n, tc)
        return spark.createDataFrame(
            [(b, c, n, tc) for b, (c, n, tc) in sorted(per_key.items())],
            "bucket long, n_updates long, n_events long, total_cents long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


S22_SQL = f"""
SELECT user_id % 10 AS bucket,
       CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_updates,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events WHERE ts < TIMESTAMP '{_S22_CUTOFF} 00:00:00'
GROUP BY user_id % 10
"""


ROUND4C.update({
    "s22_stream_update_mode": (s22_stream_update_mode, S22_SQL),
})

# ---------------------------------------------------------------- q79


def q79_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): every
    customer joined to their segment's aggregate where the segment key
    is NULLABLE (NULLIF models the 'unclassified' bucket real dims
    carry). A plain equi-join silently DROPS the NULL-key rows — the
    classic silent-data-loss bug in dimension joins; null-safe equality
    treats NULL as a joinable value, so the unclassified group flows
    through with its own aggregate. Catalyst plans `<=>` as a hash join
    on a coalesced key (EqualNullSafe is a valid equi-join predicate —
    no fallback to BNLJ), so the scale cost is the same shuffle as the
    plain join; the semantics are the only difference, and both engines
    must agree on them."""
    cust = t(spark, sf, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        (dec("c_acctbal") * 100).cast("long").alias("bal_cents"))
    seg_stats = (cust.groupBy(F.col("seg").alias("g_seg"))
                 .agg(F.count("*").cast("long").alias("seg_n"),
                      F.sum("bal_cents").alias("seg_total_cents")))
    return (cust.join(seg_stats, cust["seg"].eqNullSafe(seg_stats["g_seg"]))
            .select("c_custkey", "seg", "seg_n", "seg_total_cents")
            .orderBy("c_custkey"))


Q79_SQL = """
WITH cust AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents
  FROM customer
),
seg_stats AS (
  SELECT seg AS g_seg, CAST(COUNT(*) AS BIGINT) AS seg_n,
         CAST(SUM(bal_cents) AS BIGINT) AS seg_total_cents
  FROM cust GROUP BY seg
)
SELECT c.c_custkey, c.seg, s.seg_n, s.seg_total_cents
FROM cust c JOIN seg_stats s ON c.seg IS NOT DISTINCT FROM s.g_seg
ORDER BY c.c_custkey
"""


ROUND4C.update({
    "q79_null_safe_join": (q79_null_safe_join, Q79_SQL),
})

# ---------------------------------------------------------------- s23


def s23_stream_join_then_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream JOIN chained into a windowed AGGREGATE — the other
    multiple-stateful-operator shape next to s19's agg-over-agg (Spark
    3.4+): per-day conversion counts computed stream-side from the
    view->purchase interval join, one query, the joined stream never
    lands on storage. This is the production funnel metric: at 100 TB
    you cannot materialize the joined stream and re-aggregate it
    batch-side every day; the chain keeps join state bounded by the
    watermark AND aggregation state bounded to open windows.

    Semantics under gate (pinned by prototype): the join emits matches
    as both sides arrive; the downstream day window on `buy_ts` (the
    event-time column that survives the join with its watermark) emits
    iff day_end <= final watermark, where the final watermark is the
    MIN over both input sides of (max event ts - 1 min). The oracle is
    the batch join + the same window cutoff — equality proves the
    propagated watermark closed exactly the right windows through TWO
    stateful operators."""
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    ev = _events_stream(spark, sf)
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "1 minute"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", "1 minute"))
    joined = views.join(
        buys,
        F.expr("""v_user = b_user
                  AND buy_ts >= view_ts
                  AND buy_ts <= view_ts + interval 6 hours"""),
        "inner")
    daily = (joined
             .groupBy(F.window("buy_ts", "1 day").alias("w"))
             .agg(F.count("*").cast("long").alias("n_conversions"),
                  F.sum("purchase_id").cast("long").alias("pid_checksum"))
             .select(F.col("w.start").alias("day"), "n_conversions",
                     "pid_checksum"))
    name = f"s23_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (daily.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name).localCheckpoint()


S23_SQL = """
WITH v AS (
  SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
),
b AS (
  SELECT user_id AS bu, event_id AS purchase_id, ts AS bts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT MAX(vts) FROM v), (SELECT MAX(bts) FROM b))
         - INTERVAL 1 MINUTE AS w
),
m AS (
  SELECT b.purchase_id, CAST(date_trunc('day', b.bts) AS TIMESTAMP) AS day
  FROM v JOIN b ON v.user_id = b.bu
   AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR
)
SELECT m.day, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(m.purchase_id) AS BIGINT) AS pid_checksum
FROM m, wm WHERE m.day + INTERVAL 1 DAY <= wm.w
GROUP BY m.day
"""


ROUND4C.update({
    "s23_stream_join_then_agg": (s23_stream_join_then_agg, S23_SQL),
})

# ---------------------------------------------------------------- q80


def q80_correlated_agg_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated AGGREGATE subquery in the WHERE clause — customers
    whose balance exceeds THEIR NATION's average (plus that nation's
    customer count via a second correlated scalar) — the decorrelation
    stress case: a naive engine re-scans customer once per outer row
    (the reference's N+1 shape, `CotyData_IPN.py`'s per-row lookups);
    Catalyst must rewrite both subqueries into ONE grouped join
    (RewriteCorrelatedScalarSubquery) for this to be runnable at all at
    scale. The oracle runs the IDENTICAL correlated SQL on DuckDB —
    both decorrelations must agree, including the empty-group NULL
    semantics the rewrite is famous for getting subtly wrong.

    above-average is written as the integer cross-multiply
    bal_cents * n > sum_cents (exact; a float AVG's low bits differ
    between engines and could flip the strict compare at the boundary —
    the repo-wide determinism rule, _util.py)."""
    t(spark, sf, "customer").createOrReplaceTempView("q80_customer")
    t(spark, sf, "nation").createOrReplaceTempView("q80_nation")
    return spark.sql("""
SELECT n.n_name, c.c_name,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM q80_customer c2
        WHERE c2.c_nationkey = c.c_nationkey) AS nation_customers
FROM q80_customer c JOIN q80_nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT)
      * (SELECT COUNT(*) FROM q80_customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(CAST(c3.c_acctbal AS DECIMAL(12,4)) * 100
                         AS BIGINT))
         FROM q80_customer c3 WHERE c3.c_nationkey = c.c_nationkey)
ORDER BY n.n_name, c.c_name
""")


Q80_SQL = """
SELECT n.n_name, c.c_name,
       CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey) AS nation_customers
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT)
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(CAST(c3.c_acctbal AS DECIMAL(12,4)) * 100
                         AS BIGINT))
         FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
ORDER BY n.n_name, c.c_name
"""


ROUND4C.update({
    "q80_correlated_agg_subquery": (q80_correlated_agg_subquery, Q80_SQL),
})

# ---------------------------------------------------------------- q81

_Q81_CUTOFF = "2024-01-11"


def q81_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Native XML round-trip (Spark 4's built-in xml source — the
    spark-xml donation): the daily rollup written as XML records with a
    NESTED element (`m/{n,c}`), read back under an explicit schema, and
    re-projected — the feed format half the world's ERP/SOAP-era
    exports still arrive in. Nested-element mapping is where XML
    readers break (attribute vs element, struct flattening), so the
    struct column is the point of the gate; value parity against the
    parquet-derived oracle proves writer and reader agree on it.

    XML is a driver-side-parse-heavy format — at 100 TB you ingest it
    ONCE into parquet (exactly what this query's write+read models) and
    never query it in place; per-file parallelism still applies (one
    task per file, the same ingest shape as q61's JSONL)."""
    import shutil
    import tempfile

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_Q81_CUTOFF).cast("timestamp"))
          .select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("day"), "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))
    rollup = (ev.groupBy("day", "event_type")
              .agg(F.struct(F.count("*").cast("long").alias("n"),
                            F.sum("cents").alias("c")).alias("m")))
    work = tempfile.mkdtemp(prefix="q81_")
    try:
        rollup.write.format("xml").option("rootTag", "days") \
            .option("rowTag", "rec").mode("overwrite").save(work)
        back = (spark.read.format("xml").option("rowTag", "rec")
                .schema("day string, event_type string, "
                        "m struct<n: long, c: long>")
                .load(work))
        return (back.select("day", "event_type",
                            F.col("m.n").alias("n_events"),
                            F.col("m.c").alias("total_cents"))
                .orderBy("day", "event_type")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q81_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
WHERE ts < TIMESTAMP '{_Q81_CUTOFF} 00:00:00'
GROUP BY day, event_type
ORDER BY day, event_type
"""


ROUND4C.update({
    "q81_xml_roundtrip": (q81_xml_roundtrip, Q81_SQL),
})

# ---------------------------------------------------------------- q82


def q82_sql_udf_installments(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative SQL UDFs (Spark 4's CREATE FUNCTION ... RETURN): a
    scalar money-cents function and a correlated TABLE function
    expanding each order into its installment schedule (equal parts,
    integer-exact, remainder on installment 1) consumed via LATERAL —
    the ERP payment-plan shape (`Payments[]` expansion in the
    reference, `CotyData_IPN.py:263-266`) expressed as a reusable SQL
    library instead of Python. The scale point: SQL UDFs INLINE into
    the Catalyst plan (the lateral TVF becomes the same explode the
    hand-written form plans; whole-stage codegen applies), where a
    Python UDF would be an Arrow round-trip per batch — this is the
    §2.10 zero-Python-in-core discipline extended to user-defined
    logic. The oracle replays the expansion with DuckDB's
    generate_series lateral; integer division + modulo keep every
    installment exact (they must re-sum to the order total by
    construction)."""
    t(spark, sf, "orders").createOrReplaceTempView("q82_orders")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION q82_cents(x DOUBLE) RETURNS BIGINT
RETURN CAST(CAST(x AS DECIMAL(12,4)) * 100 AS BIGINT)""")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION q82_installments(total BIGINT, n INT)
RETURNS TABLE (k INT, amount_cents BIGINT)
RETURN SELECT k, CASE WHEN k = 1 THEN total DIV n + total % n
                      ELSE total DIV n END AS amount_cents
       FROM (SELECT explode(sequence(1, n)) AS k)""")
    # a scalar SQL UDF can't appear inside a SQL TVF's arguments
    # (UNSUPPORTED_SQL_UDF_USAGE) — apply it in a derived table first
    return spark.sql("""
WITH o AS (
  SELECT o_orderkey, q82_cents(o_totalprice) AS total,
         CAST(o_orderkey % 3 AS INT) + 1 AS n
  FROM q82_orders WHERE o_orderkey % 97 = 0
)
SELECT o.o_orderkey, i.k AS installment, i.amount_cents
FROM o, LATERAL q82_installments(o.total, o.n) i
ORDER BY o.o_orderkey, installment
""")


Q82_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT) AS total,
         CAST(o_orderkey % 3 + 1 AS INT) AS n
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o.o_orderkey, CAST(u.k AS INT) AS installment,
       CAST(CASE WHEN u.k = 1 THEN o.total // o.n + o.total % o.n
                 ELSE o.total // o.n END AS BIGINT) AS amount_cents
FROM o, LATERAL unnest(generate_series(1, o.n)) AS u(k)
ORDER BY o.o_orderkey, installment
"""


ROUND4C.update({
    "q82_sql_udf_installments": (q82_sql_udf_installments, Q82_SQL),
})

# ---------------------------------------------------------------- q83

# deterministic case-mangling shared by engine and oracle: 3 variants of
# each segment keyed on custkey % 3 (AS-IS / lower / Titlecase-by-hand,
# spelled identically in both SQL dialects — no initcap dependence)
_Q83_MANGLE = """
  SELECT CASE CAST(c_custkey % 3 AS INT)
           WHEN 0 THEN c_mktsegment
           WHEN 1 THEN lower(c_mktsegment)
           ELSE concat(upper(substring(c_mktsegment, 1, 1)),
                       lower(substring(c_mktsegment, 2)))
         END AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS cents
  FROM {customer}
"""


def q83_collated_grouping(spark: SparkSession, sf: str) -> DataFrame:
    """COLLATION-aware grouping (Spark 4 string collations): a segment
    column arriving in three case spellings (AS-IS / lower / Title —
    the normalization mess every multi-source dim feed has) grouped
    under UTF8_LCASE so the variants merge WITHOUT rewriting the data —
    collation is declared on the comparison, not baked into a
    lower()'d copy of the column. That distinction matters at 100 TB:
    a collated group/join keeps the original bytes (no second
    materialized column, and data-skipping stats on the original
    column stay usable); the lower() rewrite is exactly what the
    oracle does, so equality proves the declared-collation path
    computes the same partition of rows. min(lower(seg)) projects a
    deterministic representative (the group's member spellings differ;
    any raw representative would be engine-order-dependent)."""
    t(spark, sf, "customer").createOrReplaceTempView("q83_customer")
    mangle = _Q83_MANGLE.format(customer="q83_customer")
    return spark.sql(f"""
WITH m AS ({mangle})
SELECT min(lower(seg)) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM m
GROUP BY seg COLLATE UTF8_LCASE
ORDER BY segment
""")


Q83_SQL = f"""
WITH m AS ({_Q83_MANGLE.format(customer="customer")})
SELECT lower(seg) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM m
GROUP BY lower(seg)
ORDER BY segment
"""


ROUND4C.update({
    "q83_collated_grouping": (q83_collated_grouping, Q83_SQL),
})

# ---------------------------------------------------------------- q84

# one query text, two dialects-identical forms: the NOT IN / NOT EXISTS
# null trap. The subquery's key is NULL for negative-balance customers.
_Q84_BODY = """
WITH sub AS (
  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
  FROM {customer}
)
SELECT 'not_in' AS form, CAST(COUNT(*) AS BIGINT) AS n
FROM {orders} WHERE o_custkey NOT IN (SELECT k FROM sub)
UNION ALL
SELECT 'not_in_filtered', CAST(COUNT(*) AS BIGINT)
FROM {orders}
WHERE o_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
UNION ALL
SELECT 'not_exists', CAST(COUNT(*) AS BIGINT)
FROM {orders} o
WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = o.o_custkey)
UNION ALL
SELECT 'in', CAST(COUNT(*) AS BIGINT)
FROM {orders} WHERE o_custkey IN (SELECT k FROM sub)
"""


def q84_not_in_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    """The NOT IN null trap, pinned cross-engine: with ANY NULL in the
    subquery, `x NOT IN (sub)` is never TRUE (three-valued logic:
    x <> NULL is UNKNOWN), so the not_in row counts ZERO orders while
    the NOT EXISTS form — the one users actually mean — counts the
    orders of negative-balance customers. The four forms in one gated
    output are the semantics table every SQL engine must agree on
    (`IN` still matches normally; the IS NOT NULL guard restores the
    intended anti-join).

    Scale note: Catalyst plans the un-guarded NOT IN as a NULL-AWARE
    anti join — for a single key column an optimized broadcast NAAJ,
    otherwise a nested-loop — which is why production pipelines write
    the guarded form or NOT EXISTS (plain broadcast/shuffled anti
    join, q05's shape). The semantics pinned here are the reason the
    planner can't just rewrite one into the other."""
    t(spark, sf, "customer").createOrReplaceTempView("q84_customer")
    t(spark, sf, "orders").createOrReplaceTempView("q84_orders")
    return spark.sql(_Q84_BODY.format(customer="q84_customer",
                                      orders="q84_orders"))


Q84_SQL = _Q84_BODY.format(customer="customer", orders="orders")


ROUND4C.update({
    "q84_not_in_null_semantics": (q84_not_in_null_semantics, Q84_SQL),
})

# ---------------------------------------------------------------- s24

_S24_CUTOFF = "2024-01-11"


def s24_watermark_policy_max(spark: SparkSession, sf: str) -> DataFrame:
    """multipleWatermarkPolicy = MAX, gated — the operational knob whose
    cost is DATA LOSS, pinned so it's never a surprise: with one side
    of a stream-stream join far ahead (here: the purchases feed arrives
    complete in batch 0 while views trickle one day-file per batch),
    the max policy advances the global watermark to the FAST side's
    horizon, and every later view batch is late-filtered wholesale.
    The default min policy (s17/s20) waits for the slowest side and
    loses nothing — max trades completeness for state eviction, which
    is sometimes right (bounded state over a chronically-lagging
    side) but only if you can predict exactly what is lost. This gate
    is that prediction.

    Pinned by prototype: watermark stats propagate with a TWO-batch
    effective lag under availableNow (the filter for batch i uses the
    watermark derived from stats through batch i-2; batch 0 and 1 see
    wm=0), so exactly the views of the two earliest day-files survive —
    days 1-2 join against the full purchase table (all in state from
    batch 0), unmatched ones null-emit (the final watermark sits at the
    purchase horizon, far past every surviving view's window).

    The oracle restricts the batch left join to views of the two
    earliest days — if the policy, the lag, or the late filter moved,
    the surviving-day set changes and the gate diverges."""
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (scoped_conf, stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S24_CUTOFF).cast("timestamp")))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"),
                     F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                     .alias("dcol")))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("buy_ts")))

    work = tempfile.mkdtemp(prefix="s24_")
    policy_key = "spark.sql.streaming.multipleWatermarkPolicy"
    try:
        vdir = stage_day_files(views, work)
        bdir = os.path.join(work, "buys")
        # repartition(1), not coalesce(1): coalesce collapses the whole
        # events scan+filter into ONE task; the exchange keeps the scan
        # parallel and only the (single-file) write runs on one task.
        # All buys files land in micro-batch 0 either way (no
        # maxFilesPerTrigger on this source), so one file stays the
        # deterministic choice. (optimization r12)
        buys.repartition(1).write.mode("overwrite").parquet(bdir)

        with scoped_conf(spark, policy_key, "max"):
            pv = spark.read.parquet(vdir)
            pb = spark.read.parquet(bdir)
            sv = (spark.readStream.schema(pv.schema)
                  .option("maxFilesPerTrigger", "1").parquet(vdir)
                  .drop("dcol").withWatermark("view_ts", "1 minute"))
            sb = (spark.readStream.schema(pb.schema).parquet(bdir)
                  .withWatermark("buy_ts", "1 minute"))
            joined = (sv.join(
                sb,
                F.expr("""v_user = b_user
                          AND buy_ts >= view_ts
                          AND buy_ts <= view_ts + interval 6 hours"""),
                "leftOuter")
                .select(F.col("v_user").alias("user_id"), "view_id",
                        "purchase_id",
                        (F.unix_micros("buy_ts") - F.unix_micros("view_ts"))
                        .alias("delta_us")))
            name = f"s24_sink_{abs(hash(sf)) % 10 ** 8}"
            with stream_state_partitions(spark, 4):
                q = (joined.writeStream.outputMode("append")
                     .format("memory")
                     .queryName(name).trigger(availableNow=True).start())
                q.awaitTermination(300)
                q.stop()
            return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S24_SQL = f"""
WITH v0 AS (
  SELECT user_id, event_id AS view_id, ts AS vts,
         date_trunc('day', ts) AS vday
  FROM events
  WHERE event_type = 'view' AND ts < TIMESTAMP '{_S24_CUTOFF} 00:00:00'
),
keep_days AS (
  SELECT DISTINCT vday FROM v0 ORDER BY vday LIMIT 2
),
v AS (SELECT * FROM v0 WHERE vday IN (SELECT vday FROM keep_days)),
b AS (
  SELECT user_id AS bu, event_id AS purchase_id, ts AS bts
  FROM events
  WHERE event_type = 'purchase' AND ts < TIMESTAMP '{_S24_CUTOFF} 00:00:00'
)
SELECT v.user_id, v.view_id, b.purchase_id,
       epoch_us(b.bts) - epoch_us(v.vts) AS delta_us
FROM v LEFT JOIN b ON v.user_id = b.bu
   AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR
"""


ROUND4C.update({
    "s24_watermark_policy_max": (s24_watermark_policy_max, S24_SQL),
})

# ---------------------------------------------------------------- q85


def q85_calendar_tz_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar + timezone semantics battery: ISO week-year fields and a
    UTC->America/New_York local-day rollup, gated cross-engine. These
    are the fields where engines classically disagree — week-of-year
    (ISO vs US), day-of-week origin (Spark dayofweek is Sunday=1;
    weekday is Monday=0), week truncation start, and the DIRECTION of
    timezone conversion (DuckDB's timezone(tz, naive_ts) interprets the
    naive value as tz-LOCAL, the inverse of Spark's from_utc_timestamp;
    the oracle must route through TIMESTAMPTZ to express the same
    conversion). The pinned mapping:

        Spark extract(YEAROFWEEK)   == DuckDB isoyear
        Spark weekofyear            == DuckDB week        (both ISO)
        Spark weekday + 1           == DuckDB isodow      (Mon=1)
        Spark date_trunc('week')    == DuckDB date_trunc('week') (Mon)
        Spark from_utc_timestamp(ts, z)
          == DuckDB timezone(z, CAST(ts AS TIMESTAMPTZ)) under a UTC
             session (which `ensure_session_confs` pins Spark to and
             the oracle harness runs DuckDB under)

    The corpus spans January (fixed EST offset); the conversion
    machinery is identical through DST — the mapping above is what the
    gate pins, per-zone offset tables come from the same IANA data in
    both engines."""
    ev = t(spark, sf, "events").select(
        "ts", F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    nyd = F.date_format(
        F.date_trunc("day", F.from_utc_timestamp("ts", "America/New_York")),
        "yyyy-MM-dd")
    return (ev.select(
        F.expr("extract(YEAROFWEEK FROM ts)").cast("long").alias("iso_year"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        (F.weekday("ts") + 1).cast("long").alias("isodow"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
        .alias("week_start"),
        nyd.alias("ny_day"), "cents")
        .groupBy("iso_year", "iso_week", "isodow", "week_start", "ny_day")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum("cents").cast("long").alias("total_cents")))


Q85_SQL = """
SELECT CAST(isoyear(ts) AS BIGINT) AS iso_year,
       CAST(week(ts) AS BIGINT) AS iso_week,
       CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS week_start,
       CAST(CAST(date_trunc('day',
             timezone('America/New_York', CAST(ts AS TIMESTAMPTZ)))
            AS DATE) AS VARCHAR) AS ny_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY iso_year, iso_week, isodow, week_start, ny_day
"""


ROUND4C.update({
    "q85_calendar_tz_battery": (q85_calendar_tz_battery, Q85_SQL),
})

# ---------------------------------------------------------------- q86


def _q86_frames(spark: SparkSession, sf: str, work: str):
    """Build the partitioned fact + filtered-dim join q86 gates; split
    out so the plan test pins DPP on the SAME frame the gate runs."""
    ev = (t(spark, sf, "events")
          .select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("day"), "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))
    ev.write.mode("overwrite").partitionBy("day").parquet(work)
    dim = (ev.select("day").distinct()
           .withColumn("dow", (F.weekday(F.to_date("day")) + 1)
                       .cast("long")))
    fact = spark.read.parquet(work)
    return (fact.join(F.broadcast(dim.filter(F.col("dow") <= 2)), "day")
            .groupBy("day", "event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("cents").cast("long").alias("total_cents")))


def q86_dynamic_partition_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """DYNAMIC partition pruning gated end-to-end: a day-partitioned
    fact joined to a dimension whose filter (weekday <= 2: Mondays and
    Tuesdays) is NOT on the partition column — the qualifying day set
    exists only at runtime, so static pruning (q74/q75's kind) can't
    help; Catalyst plants a dynamicpruningexpression subquery on the
    fact scan that broadcasts the filtered dim's keys and skips every
    other partition's files entirely. At 100 TB this is THE mechanism
    that makes star-schema date-dim filters cheap (scan 2/7 of the
    fact, not all of it filtered after read);
    tests/test_round4c.py pins the dynamicpruning expression on this
    exact frame, and this gate pins that the pruned scan aggregates to
    the same numbers as the logical join."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="q86_")
    try:
        return _q86_frames(spark, sf, work).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q86_SQL = """
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
dim AS (
  SELECT day, isodow(CAST(day AS DATE)) AS dow
  FROM (SELECT DISTINCT day FROM ev)
)
SELECT e.day, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(e.cents) AS BIGINT) AS total_cents
FROM ev e JOIN dim d ON d.day = e.day
WHERE d.dow <= 2
GROUP BY e.day, e.event_type
"""


ROUND4C.update({
    "q86_dynamic_partition_pruning": (q86_dynamic_partition_pruning,
                                      Q86_SQL),
})

# ---------------------------------------------------------------- s25

_S25_CUTOFF = "2024-01-11"


def s25_stream_dedup_then_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming DEDUP chained into a windowed aggregate — the third
    multi-stateful combination (s19 agg->agg, s23 join->agg): an
    at-least-once feed (every day-file arrives TWICE, in consecutive
    batches — the redelivery pattern of any retrying ingest) passes
    through dropDuplicatesWithinWatermark before the daily rollup, one
    query. The aggregate must count every event exactly once: the
    dedup operator absorbs the second delivery (within the 2-day
    horizon by construction), and the downstream day window emits
    under the usual cutoff. The oracle is the batch DISTINCT rollup
    with the window rule — equality proves redelivery changed nothing,
    which is the exactly-once-from-at-least-once contract production
    feeds rely on (upstream replays being absorbed by keyed dedup
    state bounded by the watermark, not by an unbounded seen-set)."""
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S25_CUTOFF).cast("timestamp"))
          .select("event_id", "ts", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s25_")
    try:
        # each day delivered twice, back to back (redelivery feed)
        arrivals = stage_day_files(ev, work, repeats=2)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        deduped = (stream.withWatermark("ts", "2 days")
                   .dropDuplicatesWithinWatermark(["event_id"]))
        daily = (deduped
                 .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
                 .agg(F.count("*").cast("long").alias("n_events"),
                      F.sum("cents").cast("long").alias("total_cents"))
                 .select(F.col("w.start").alias("day"), "event_type",
                         "n_events", "total_cents"))
        name = f"s25_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (daily.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S25_SQL = f"""
WITH ev AS (
  SELECT DISTINCT event_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents, ts
  FROM events WHERE ts < TIMESTAMP '{_S25_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 2 DAY AS w FROM ev)
SELECT e.day, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(e.cents) AS BIGINT) AS total_cents
FROM ev e, wm
WHERE e.day + INTERVAL 1 DAY <= wm.w
GROUP BY e.day, e.event_type
"""


ROUND4C.update({
    "s25_stream_dedup_then_agg": (s25_stream_dedup_then_agg, S25_SQL),
})

# ---------------------------------------------------------------- d52


def d52_internal_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Longest INTERNAL verbatim repeat per document — the looping-text
    pathology (a model- or template-generated doc repeating a paragraph
    dozens of times) that token-level repetition RATES (d15) can see
    but cannot size: d15 says "40% repeated 5-grams", this says "one
    61-token block occurs twice". d50's diagonal-streak machinery
    turned inward: a doc's k-gram positions self-joined on the hash
    with pa < pb; a streak of consecutive pa on diagonal pb - pa > 0
    certifies a repeated run of streak + k - 1 tokens (the diagonal
    value is the repeat DISTANCE — adjacent copies vs far-apart
    copies — carried through as the distance of the longest repeat).
    Windows partition by (doc, diagonal): bounded by one document's
    self-match volume, never corpus-sized."""
    from pyspark.sql import Window

    k, min_run = 2, 3  # synthetic corpus repeats are short; k=2 makes
    # the detector sensitive to them (real curation would run k=5+)
    df = t(spark, sf, "documents")
    df = df.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id"))
    toks = F.split(F.col("text"), " ")
    tok_rows = df.select(
        F.col("doc_id").alias("doc"), F.size(toks).alias("sz"),
        F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    from etl_docker_spark.llm.dedup import _base_hash
    grams = (tok_rows.select("doc", "sz", "pos",
                             F.concat_ws(" ", *leads).alias("s"))
             .filter(F.col("pos") <= F.col("sz") - k)
             .select("doc", F.col("pos").cast("long").alias("p"),
                     _base_hash(F.col("s")).alias("h")))
    m = (grams.alias("a").join(grams.alias("b"),
                               (F.col("a.doc") == F.col("b.doc"))
                               & (F.col("a.h") == F.col("b.h"))
                               & (F.col("a.p") < F.col("b.p")))
         .select(F.col("a.doc").alias("doc"), F.col("a.p").alias("pa"),
                 (F.col("b.p") - F.col("a.p")).alias("d")))
    w2 = Window.partitionBy("doc", "d").orderBy("pa")
    runs = (m.withColumn("grp", F.col("pa") - F.row_number().over(w2))
            .groupBy("doc", "d", "grp")
            .agg(F.count("*").alias("s")))
    w3 = Window.partitionBy("doc").orderBy(F.desc("s"), F.asc("d"))
    return (runs.withColumn("rn", F.row_number().over(w3))
            .filter(F.col("rn") == 1)
            .select(F.col("doc").alias("doc_id"),
                    (F.col("s") + k - 1).cast("long")
                    .alias("max_repeat_tokens"),
                    F.col("d").cast("long").alias("repeat_distance"))
            .filter(F.col("max_repeat_tokens") >= min_run))


D52_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
g AS (
  SELECT doc_id, i AS p,
         CAST('0x' || substring(
           md5(array_to_string(tk[i:i+1], ' ')), 1, 8) AS BIGINT) AS h
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
m AS (
  SELECT a.doc_id AS doc, a.p AS pa, b.p - a.p AS d
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.h = b.h AND a.p < b.p
),
r AS (
  SELECT doc, d, pa,
         pa - row_number() OVER (PARTITION BY doc, d ORDER BY pa) AS grp
  FROM m
),
runs AS (
  SELECT doc, d, grp, COUNT(*) AS s FROM r GROUP BY doc, d, grp
),
best AS (
  SELECT doc, s, d,
         row_number() OVER (PARTITION BY doc ORDER BY s DESC, d ASC) AS rn
  FROM runs
)
SELECT doc AS doc_id, CAST(s + 1 AS BIGINT) AS max_repeat_tokens,
       CAST(d AS BIGINT) AS repeat_distance
FROM best WHERE rn = 1 AND s + 1 >= 3
"""


ROUND4C.update({
    "d52_internal_repetition": (d52_internal_repetition, D52_SQL),
})
