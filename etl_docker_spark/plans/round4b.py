"""Round-4b queries: skyline, exact prefix-filter similarity join,
stream-dedup state expiry.

Same determinism discipline as every other plan module: money in integer
cents (decimal sum first, multiply, then one cast), integer outputs
pinned BIGINT, md5-derived hashes, identical column names on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dec, t

# ---------------------------------------------------------------- q72


def q72_skyline_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto-frontier customers: nobody both spends more AND holds a
    larger balance. The relational form is a quadratic NOT-EXISTS
    anti-self-join; the engine runs the distributed two-phase skyline
    instead (`operators/skyline.py`): per-partition vectorized
    sort-sweep, then the exact sweep over the tiny union of local
    skylines — the TakeOrdered shape, no O(n^2) anywhere.

    Spend aggregates BEFORE the customer join (digest-width shuffle on
    o_custkey, then a key-aligned join AQE plans as it likes); cents are
    exact integers on both sides.
    """
    from etl_docker_spark.operators.skyline import pareto_frontier

    spend = (t(spark, sf, "orders")
             .groupBy("o_custkey")
             .agg((F.sum(dec("o_totalprice")) * 100)
                  .cast("long").alias("spend_cents")))
    pts = (t(spark, sf, "customer")
           .join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
           .select("c_custkey",
                   F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
                   (dec("c_acctbal") * 100).cast("long").alias("bal_cents")))
    return (pareto_frontier(pts, "spend_cents", "bal_cents")
            .orderBy("c_custkey"))


Q72_SQL = """
WITH pts AS (
  SELECT c.c_custkey,
         CAST(coalesce(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))), 0) * 100
              AS BIGINT) AS spend_cents,
         CAST(CAST(c.c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT) AS bal_cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
)
SELECT p.c_custkey, p.spend_cents, p.bal_cents
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.spend_cents >= p.spend_cents AND q.bal_cents >= p.bal_cents
    AND (q.spend_cents > p.spend_cents OR q.bal_cents > p.bal_cents))
ORDER BY p.c_custkey
"""


# ---------------------------------------------------------------- d47


def prefix_jaccard_pairs_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-session memoized exact-Jaccard pair frame at the default
    t = 1/2 (disk tier keyed on the corpus, like minhash_pairs_frame):
    d47 gates it, d48 re-consumes it for the exact component labeling —
    the shingle+md5 corpus pass and the prefix join run once per
    session instead of once per consumer. Values are deterministic, so
    cached == rebuilt for the gate."""
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs
    from etl_docker_spark.llm.index_cache import memo_frame

    return memo_frame(
        spark, f"d47_pairs:{sf}",
        lambda: prefix_filter_jaccard_pairs(
            t(spark, sf, "documents"), "doc_id", "text", shingle_n=3),
        sf_dir=sf)


def d47_prefix_filter_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.5 dedup pairs via prefix filtering
    (AllPairs/PPJoin candidates) — the ground-truth twin of d06's
    MinHash-LSH pairs: same (doc_a, doc_b, inter_n, union_n) contract,
    but complete by construction (the oracle is the brute-force
    all-pairs join; the engine never materializes all pairs — see
    `llm/dedup.py:prefix_filter_jaccard_pairs` for the shuffle ledger
    and the rarest-token-prefix argument that keeps it subquadratic)."""
    return prefix_jaccard_pairs_frame(spark, sf)


# Shared with D06_SQL (llm_queries.py): identical tokenize -> 3-shingle ->
# md5-32 hash pipeline, so the two oracles stay in lockstep by text.
_D47_HASHED_CTES = """
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 1)),
                                      i -> array_to_string(tk[i:i+2], ' '))) AS sh
  FROM toks
),
hashed AS (
  SELECT doc_id,
         list_transform(sh, s -> CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)) AS hh
  FROM sh
)"""

D47_SQL = f"""
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
WHERE 2 * p.inter_n >= len(sa.hs) + len(sb.hs) - p.inter_n
"""


ROUND4B = {
    "q72_skyline_customers": (q72_skyline_customers, Q72_SQL),
    "d47_prefix_filter_jaccard": (d47_prefix_filter_jaccard, D47_SQL),
}

# ---------------------------------------------------------------- s16

_S16_CUTOFF = "2024-01-11"  # same 10-day / 10-batch feed as s14/s15
_S16_DELAY_DAYS = 2


def s16_stream_dedup_expiry(spark: SparkSession, sf: str) -> DataFrame:
    """dropDuplicatesWithinWatermark STATE-EXPIRY semantics, gated. s04
    pins plain streaming dedup (infinite state, nothing re-emits); this
    pins the bounded-state variant every 100 TB deployment actually
    runs: a key's dedup state lives only `delay` past its FIRST event,
    so a key re-appearing after expiry is EMITTED AGAIN — that
    re-emission (exactly-once only within the horizon, at-least-once
    beyond it) is the contract under test, and what keeps dedup state
    finite at scale.

    Timing rule, pinned empirically on this engine (prototype in this
    round's notes; same one-batch watermark lag as s13/s14):

      - eviction watermark before batch i = max event time over batches
        < i, minus delay;
      - a key's state expires when that watermark STRICTLY exceeds
        first_event_time + delay (dropped duplicates do NOT extend it);
      - so with midnight-aligned day batches, a key last emitted at day
        e re-emits at its first active day d with
        prev_global_day(d) > e + 2*delay.

    The feed is one file per calendar day (mtime-ordered,
    maxFilesPerTrigger=1), each pre-aggregated to one row per
    (state_key, day) so within-batch arrival order can't matter. With
    delay=2 over a 10-day feed a key emits at most twice (a third
    emission needs prev_global_day > day 11 — past the feed), which is
    what lets the oracle replay the rule with two aggregation passes
    instead of a recursive CTE.
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S16_CUTOFF).cast("timestamp"))
          .select(
              F.concat_ws(":", F.col("user_id").cast("string"),
                          "event_type").alias("state_key"),
              F.date_trunc("day", F.col("ts")).alias("day"),
              F.round(F.col("value") * 100, 0).cast("long").alias("cents")))
    per = (ev.groupBy("state_key", "day")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.sum("cents").alias("total_cents"))
           .withColumn("dcol", F.date_format("day", "yyyy-MM-dd")))

    work = tempfile.mkdtemp(prefix="s16_")
    try:
        arrivals = stage_day_files(per, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        out = (stream
               .withWatermark("day", f"{_S16_DELAY_DAYS} days")
               .dropDuplicatesWithinWatermark(["state_key"]))
        name = f"s16_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(
                spark, spark.sparkContext.defaultParallelism):
            q = (out.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return (spark.table(name)
                .select("state_key", "day", "n_events", "total_cents")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S16_SQL = f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS state_key,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE ts < TIMESTAMP '{_S16_CUTOFF} 00:00:00'
),
kd AS (
  SELECT state_key, day, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM ev GROUP BY state_key, day
),
gd AS (
  SELECT day, lag(day) OVER (ORDER BY day) AS prev_day
  FROM (SELECT DISTINCT day FROM kd)
),
kdp AS (SELECT kd.*, gd.prev_day FROM kd JOIN gd USING (day)),
first AS (SELECT state_key, MIN(day) AS d0 FROM kdp GROUP BY state_key),
second AS (
  SELECT k.state_key, MIN(k.day) AS d1
  FROM kdp k JOIN first f USING (state_key)
  WHERE k.prev_day > f.d0 + INTERVAL {2 * _S16_DELAY_DAYS} DAY
  GROUP BY k.state_key
)
SELECT k.state_key, k.day, k.n_events, k.total_cents
FROM kdp k
JOIN first f ON f.state_key = k.state_key
LEFT JOIN second s ON s.state_key = k.state_key
WHERE k.day = f.d0 OR k.day = s.d1
"""


ROUND4B.update({
    "s16_stream_dedup_expiry": (s16_stream_dedup_expiry, S16_SQL),
})

# ---------------------------------------------------------------- s17


def s17_stream_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, gated — the null-emission
    timing s05's inner join can't see. An outer stream-stream join is
    the production shape of "views that never converted": the engine
    may only emit the null-padded row once the watermark PROVES no
    matching purchase can still arrive, and must never emit it for a
    view whose window the watermark hasn't closed (those stay in state
    — at 100 TB the watermark is the only thing bounding that state).

    Emission rule, pinned empirically (prototype: views at hours 0..19,
    watermark-driving purchase at 20h, 0s delays — exactly views
    0..12 emitted nulls):

      - the global watermark is the MIN over both sides of
        (max event time - that side's delay)
        (spark.sql.streaming.multipleWatermarkPolicy = min, the
        default);
      - an unmatched view emits its null row iff
        view_ts + 6h < final_watermark, STRICT (the boundary view at
        exactly wm - 6h stays in state and never emits);
      - matched rows emit as they match, independent of the rule.

    Views whose window the final no-data batch leaves open simply never
    appear — the restart-from-checkpoint analog of s15's open sessions.
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
        "leftOuter")
        .select(F.col("v_user").alias("user_id"), "view_id", "purchase_id",
                (F.unix_micros("buy_ts") - F.unix_micros("view_ts"))
                .alias("delta_us")))
    name = f"s17_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name).localCheckpoint()


S17_SQL = """
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
unmatched AS (
  SELECT v.user_id, v.view_id,
         CAST(NULL AS BIGINT) AS purchase_id,
         CAST(NULL AS BIGINT) AS delta_us
  FROM v, wm
  WHERE v.vts + INTERVAL 6 HOUR < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM b
      WHERE b.bu = v.user_id
        AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 6 HOUR)
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


ROUND4B.update({
    "s17_stream_outer_join": (s17_stream_outer_join, S17_SQL),
})

# ---------------------------------------------------------------- q73


def _q73_bucketed_frames(spark: SparkSession, sf: str):
    """Write orders+customer bucketed on the join key, return the lazy
    co-located join (and the table names for cleanup). Separated from
    the query so tests can pin the no-Exchange plan on the SAME frame
    the gate runs."""
    from etl_docker_spark.operators.skew import write_bucketed

    # Deterministic tag: abs(hash(sf)) varies per process (PYTHONHASHSEED),
    # so a crash between write and the finally-DROP leaked orphan tables
    # with unpredictable names (ADVICE r4). md5 keeps the name stable, and
    # any q73_* leftover from a crashed prior run is dropped up front.
    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    t_ord, t_cust = f"q73_orders_{tag}", f"q73_customer_{tag}"
    for row in spark.sql("SHOW TABLES").collect():
        if row["tableName"].startswith("q73_"):
            spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
    write_bucketed(
        t(spark, sf, "orders").select("o_custkey", "o_totalprice"),
        t_ord, ["o_custkey"], num_buckets=8, sort_by=["o_custkey"])
    write_bucketed(
        t(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
        t_cust, ["c_custkey"], num_buckets=8, sort_by=["c_custkey"])
    joined = (
        spark.table(t_ord)
        .join(spark.table(t_cust).hint("MERGE"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_orders"),
             (F.sum(dec("o_totalprice")) * 100).cast("long")
             .alias("revenue_cents"))
        .orderBy("c_mktsegment"))
    return joined, (t_ord, t_cust)


def q73_bucketed_cojoin(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed CO-LOCATED join, gated end-to-end through the write path:
    both sides are persisted `bucketBy` the join key (8 buckets, sorted),
    so the sort-merge join reads pre-shuffled, pre-sorted buckets and
    plans with ZERO Exchange below the join — the shuffle is paid once
    at write time, then never again on any number of downstream joins.
    That trade is the core of every serious 100 TB star-schema layout;
    `tests/test_round4b.py` pins the no-Exchange property on this exact
    frame, and this gate pins that the bucketed write+read+join path is
    value-identical to the logical join (the oracle never sees buckets).

    The MERGE hint forces the sort-merge path (a broadcast of the small
    gate-scale dim side would silently bypass the bucket co-location
    this query exists to exercise)."""
    joined, tables = _q73_bucketed_frames(spark, sf)
    try:
        return joined.localCheckpoint()
    finally:
        for tbl in tables:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


Q73_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))) * 100 AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


ROUND4B.update({
    "q73_bucketed_cojoin": (q73_bucketed_cojoin, Q73_SQL),
})

# ---------------------------------------------------------------- q74

_Q74_PATCH_DAY = "2024-01-05"
_Q74_CUTOFF = "2024-01-11"


def q74_partition_reload(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic-partition-overwrite incremental reload, gated end-to-end
    through disk: the daily-reload shape every 100 TB warehouse runs.

      1. full load: per-(day, event_type) counts+cents for the 10-day
         window, written day-partitioned;
      2. corrected re-load of ONE day (business rule change: 'view'
         events excluded) via `overwrite_partitions_dynamic` — ONLY
         that day's partition is rewritten (static overwrite would
         truncate all ten);
      3. the gated output is what a consumer READS BACK from disk.

    The oracle states the expected merged table directly (patched day
    without views, sibling days untouched) — if the dynamic overwrite
    leaked into any other partition, or failed to replace the target
    day, counts diverge. tests/test_formats.py pins the operator on a
    toy frame; this pins it at gate scale through the parquet
    round-trip."""
    import shutil
    import tempfile

    from etl_docker_spark.sinks.writers import overwrite_partitions_dynamic

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_Q74_CUTOFF).cast("timestamp"))
          .select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("day"), "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents")))

    def rollup(df):
        return df.groupBy("day", "event_type").agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").alias("total_cents"))

    work = tempfile.mkdtemp(prefix="q74_")
    try:
        rollup(ev).write.mode("overwrite").partitionBy("day").parquet(work)
        patch = rollup(ev.filter((F.col("day") == _Q74_PATCH_DAY)
                                 & (F.col("event_type") != "view")))
        overwrite_partitions_dynamic(patch, work, ["day"])
        return (spark.read.parquet(work)
                .select("day", "event_type", "n_events", "total_cents")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q74_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS VARCHAR) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
WHERE ts < TIMESTAMP '{_Q74_CUTOFF} 00:00:00'
  AND NOT (CAST(date_trunc('day', ts) AS VARCHAR) = '{_Q74_PATCH_DAY}'
           AND event_type = 'view')
GROUP BY day, event_type
"""


ROUND4B.update({
    "q74_partition_reload": (q74_partition_reload, Q74_SQL),
})

# ---------------------------------------------------------------- d48


def d48_dup_cluster_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-level audit of approximate vs exact dedup: connected
    components over BOTH pair graphs — d47's exact prefix-filter join
    and d06's MinHash-LSH survivors — with min-doc-id labels, so the
    labelings are directly comparable. Since LSH verification is exact
    Jaccard, the MinHash edge set is a SUBSET of the exact one; what
    banding can lose is CONNECTIVITY (a missed edge can split a true
    cluster even when most pairs survive). d45 audits pair-level
    agreement; this is the cluster-level consequence — the number that
    tells you how much corpus-dedup (d14-style keep-one-per-cluster)
    would over-retain under the approximate graph.

    Output, one row per method: docs in the pair graph, component
    count, largest component, and docs whose label matches the exact
    labeling (n_label_match == n_docs on the 'exact' row by
    construction only if the minhash graph found every doc — it's the
    shared-doc matched count on both rows, so the rows are symmetric).
    """
    from etl_docker_spark.operators.graph import connected_components
    from etl_docker_spark.plans.llm_queries import minhash_pairs_frame

    lab_e = connected_components(
        prefix_jaccard_pairs_frame(spark, sf),
        src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
    lab_m = connected_components(
        minhash_pairs_frame(spark, sf),
        src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))

    agree = (lab_e.alias("e")
             .join(lab_m.alias("m"), "doc_id")
             .filter(F.col("e.cluster_id") == F.col("m.cluster_id"))
             .count())

    def stats(lab: DataFrame, method: str) -> DataFrame:
        sizes = lab.groupBy("cluster_id").agg(F.count("*").alias("sz"))
        return (lab.agg(F.count("*").cast("long").alias("n_docs"))
                .crossJoin(sizes.agg(
                    F.count("*").cast("long").alias("n_clusters"),
                    F.max("sz").cast("long").alias("max_cluster_sz")))
                .select(F.lit(method).alias("method"), "n_docs",
                        "n_clusters", "max_cluster_sz",
                        F.lit(agree).cast("long").alias("n_label_match")))

    return stats(lab_e, "exact").unionByName(stats(lab_m, "minhash"))


from etl_docker_spark.plans.advanced import _D06_BODY  # noqa: E402

D48_SQL = f"""
WITH RECURSIVE {_D06_BODY}
, mh_pairs AS (
  SELECT doc_a, doc_b FROM ver WHERE 2 * inter_n >= total_n - inter_n
),
tokx AS (SELECT doc_id, unnest(hs) AS h FROM hs),
ex_pre AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
  FROM tokx a JOIN tokx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ex_pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM ex_pre p
  JOIN hs sa ON sa.doc_id = p.doc_a
  JOIN hs sb ON sb.doc_id = p.doc_b
  WHERE 2 * p.inter_n >= len(sa.hs) + len(sb.hs) - p.inter_n
),
eedges AS (
  SELECT doc_a AS a, doc_b AS b FROM ex_pairs
  UNION ALL SELECT doc_b, doc_a FROM ex_pairs
),
ereach AS (
  SELECT a AS node, b AS other FROM eedges
  UNION
  SELECT r.node, e.b FROM ereach r JOIN eedges e ON r.other = e.a
),
elab AS (
  SELECT node AS doc_id, LEAST(node, MIN(other)) AS cluster_id
  FROM ereach GROUP BY node
),
medges AS (
  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
  UNION ALL SELECT doc_b, doc_a FROM mh_pairs
),
mreach AS (
  SELECT a AS node, b AS other FROM medges
  UNION
  SELECT r.node, e.b FROM mreach r JOIN medges e ON r.other = e.a
),
mlab AS (
  SELECT node AS doc_id, LEAST(node, MIN(other)) AS cluster_id
  FROM mreach GROUP BY node
),
agree AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM elab e JOIN mlab m USING (doc_id)
  WHERE e.cluster_id = m.cluster_id
),
estats AS (
  SELECT 'exact' AS method,
         CAST((SELECT COUNT(*) FROM elab) AS BIGINT) AS n_docs,
         CAST((SELECT COUNT(DISTINCT cluster_id) FROM elab) AS BIGINT)
           AS n_clusters,
         CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM elab
               GROUP BY cluster_id)) AS BIGINT) AS max_cluster_sz,
         (SELECT n FROM agree) AS n_label_match
),
mstats AS (
  SELECT 'minhash' AS method,
         CAST((SELECT COUNT(*) FROM mlab) AS BIGINT) AS n_docs,
         CAST((SELECT COUNT(DISTINCT cluster_id) FROM mlab) AS BIGINT)
           AS n_clusters,
         CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM mlab
               GROUP BY cluster_id)) AS BIGINT) AS max_cluster_sz,
         (SELECT n FROM agree) AS n_label_match
)
SELECT * FROM estats UNION ALL SELECT * FROM mstats
"""


ROUND4B.update({
    "d48_dup_cluster_agreement": (d48_dup_cluster_agreement, D48_SQL),
})

# ---------------------------------------------------------------- s18

_S18_CUTOFF = "2024-01-11"


def s18_stream_checkpoint_resume(spark: SparkSession, sf: str) -> DataFrame:
    """CHECKPOINT RECOVERY exactly-once, gated — the property every
    other s-query assumes and none exercises: state surviving a full
    query restart. The stream runs TWICE against the same checkpoint
    and file sink: run 1 sees days 1-5 of the feed, terminates
    (availableNow), run 2 starts a NEW streaming query from the same
    checkpoint with days 6-10 added.

    What the single gated output proves:
      - no replay: run 2's source starts from the checkpointed file
        offset — if days 1-5 were re-read, their window counts double;
      - no state loss: day 5's window is OPEN when run 1 ends (its end
        lies past run 1's watermark) — its correct counts exist only in
        recovered state, and emit in run 2 when day-6 data closes it;
      - exactly-once sink: the file sink's transaction log must commit
        each batch once across the restart boundary.
    Day 10's window out-lives the final watermark and never appears
    (s15's open-session discipline).

    Oracle: the batch per-day aggregate restricted to windows whose end
    <= final watermark (max event time - 1 min) — days 1..9 on this
    feed.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import dsum, stream_state_partitions

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S18_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s18_")
    try:
        staged = os.path.join(work, "staged")
        # repartition(dcol): one file per day via one TASK per day, with
        # distinct days writing in parallel (round-6 staging idiom; the
        # coalesce(1) form serialized the feed through a single task)
        ev.repartition(F.col("dcol")).write.partitionBy("dcol") \
            .mode("overwrite").parquet(staged)
        arrivals = os.path.join(work, "arrivals")
        os.makedirs(arrivals)
        ckpt = os.path.join(work, "ckpt")
        sink = os.path.join(work, "sink")
        days = sorted(d for d in os.listdir(staged) if d.startswith("dcol="))
        probe_schema = None

        def run_phase(phase_days, offset):
            nonlocal probe_schema
            for i, d in enumerate(phase_days):
                src_dir = os.path.join(staged, d)
                src = next(f for f in os.listdir(src_dir)
                           if f.endswith(".parquet"))
                dst = os.path.join(arrivals, f"{offset + i:03d}.parquet")
                shutil.copyfile(os.path.join(src_dir, src), dst)
                os.utime(dst, (1700000000 + (offset + i) * 60,) * 2)
            if probe_schema is None:
                probe_schema = spark.read.parquet(arrivals).schema
            stream = (spark.readStream.schema(probe_schema)
                      .option("maxFilesPerTrigger", "1").parquet(arrivals))
            agg = (stream.withWatermark("ts", "1 minute")
                   .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
                   .agg(F.count("*").cast("long").alias("n_events"),
                        F.sum("cents").alias("total_cents"))
                   .select(F.col("w.start").alias("day"), "event_type",
                           "n_events", "total_cents"))
            q = (agg.writeStream.outputMode("append").format("parquet")
                 .option("path", sink).option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()

        with stream_state_partitions(spark, 4):
            run_phase(days[:5], 0)   # run 1: days 1-5, then terminate
            run_phase(days[5:], 5)   # run 2: resume from checkpoint
        return (spark.read.parquet(sink)
                .select("day", "event_type", "n_events", "total_cents")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S18_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents, ts
  FROM events WHERE ts < TIMESTAMP '{_S18_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev)
SELECT e.day, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(e.cents) AS BIGINT) AS total_cents
FROM ev e, wm
WHERE e.day + INTERVAL 1 DAY <= wm.w
GROUP BY e.day, e.event_type
"""


ROUND4B.update({
    "s18_stream_checkpoint_resume": (s18_stream_checkpoint_resume, S18_SQL),
})
