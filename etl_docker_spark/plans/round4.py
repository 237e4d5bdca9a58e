"""Round-4 queries: the EP3 incremental lifecycle end-to-end under the
oracle gate, plus new breadth operators.

q70 closes the last orchestration gap from the round-3 verdict: the
bookmark-driven incremental job (pipelines/incremental.py) was
golden-tested but never oracle-gated END TO END. Here the whole
lifecycle runs inside the query: first-run weekday window -> three
windowed pulls (created/modified/deleted) -> out-of-order-safe merge ->
bookmark advance -> second run resuming from the bookmark -> third run
proving the caught-up no-op. The oracle is the final merged snapshot
plus the lifecycle counters as a VALUES literal (the q68/q69 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND4: dict = {}

# ---------------------------------------------------------------- q70


def q70_incremental_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """EP3's full lifecycle (F13 bookmarks + S1 windowed pulls + K2/K3
    merge semantics) gated as one query.

    Three scheduled runs against the deterministic windowed feed
    (sources/fake_api.py, reference contract CotyData_IPN.py:597-601):

      run 1  Monday 2024-03-11, no bookmark -> weekday window Fri..Sun
             (dag_maestros.py:10-22) pulls the 03-08..03-10 slice;
      run 2  Thursday 2024-03-14 -> bookmark resumes 03-11..03-13: item 2
             arrives at v3 (skipping v2 — as-of semantics), items 1 and 4
             arrive as deletion snapshots and must flip ENABLED without
             losing their attributes (same-instant delete-beats-modify
             tie-break, pipelines/incremental.py:_order);
      run 3  2024-03-14 again -> start > end, caught_up no-op (the
             re-run idempotence half of the staging/MERGE contract).

    The result is the final target snapshot with the three run statuses
    and the bookmark high-water mark as pinned columns. `sf` is unused —
    the endpoint and the bookmark table ARE the inputs.
    """
    import datetime as dt
    import shutil
    import tempfile

    from etl_docker_spark.orchestration import Bookmarks, JobContext
    from etl_docker_spark.pipelines.incremental import (
        JOB_NAME, read_target, run_items_incremental)
    from etl_docker_spark.sources.fake_api import fetch_items_windowed

    work = tempfile.mkdtemp(prefix="q70_")
    try:
        ctx = JobContext(spark=spark, warehouse=f"{work}/wh",
                         log_path=f"{work}/audit",
                         quarantine=f"{work}/quar")
        r1 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 11))
        r2 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 14))
        r3 = run_items_incremental(ctx, fetch_items_windowed,
                                   dt.date(2024, 3, 14))
        mark = Bookmarks(ctx).last_window_end(JOB_NAME)
        out = (read_target(ctx)
               .select("Id", "Code", "Description", "CreationDatetime",
                       "ModificationDatetime", "ENABLED")
               .withColumn("r1_rows", F.lit(int(r1["rows"])))
               .withColumn("r2_rows", F.lit(int(r2["rows"])))
               .withColumn("r3_status", F.lit(str(r3["status"])))
               .withColumn("bookmark_end", F.lit(mark.isoformat()))
               .localCheckpoint())  # pin before the workdir is deleted
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q70_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'SKU-1', 'alpha v1', '2024-03-10', '2024-03-10',
   FALSE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(2 AS BIGINT), 'SKU-2', 'beta v3', '2024-03-10', '2024-03-13',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(3 AS BIGINT), 'SKU-3', 'gamma v2', '2024-03-10', '2024-03-12',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(4 AS BIGINT), 'SKU-4', 'delta v1', '2024-03-11', '2024-03-11',
   FALSE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(5 AS BIGINT), 'SKU-5', 'eps v1', '2024-03-12', '2024-03-12',
   TRUE, 6, 10, 'caught_up', '2024-03-13'),
  (CAST(6 AS BIGINT), 'SKU-6', 'zeta v1', '2024-03-13', '2024-03-13',
   TRUE, 6, 10, 'caught_up', '2024-03-13')
) AS t(Id, Code, Description, CreationDatetime, ModificationDatetime,
       ENABLED, r1_rows, r2_rows, r3_status, bookmark_end)
"""

ROUND4.update({
    "q70_incremental_lifecycle": (q70_incremental_lifecycle, Q70_SQL),
})

# ---------------------------------------------------------------- s13

_S13_SPLIT = "2024-01-16"   # events before this date arrive LATE
_S13_BRIDGE = "2024-02-14"  # advances the (lagging) late-event watermark


def s13_stream_late_data_drop(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark LATE-DATA DROP semantics, gated. Every other s-query
    proves the streaming engine loses nothing (oracle = full batch
    answer); none proves the opposite contract — that data arriving
    after the watermark has passed its window is EXCLUDED. At 100 TB
    the drop rule is what bounds streaming state; an engine that
    silently keeps (or double-counts) late rows passes all no-loss
    gates and still has unbounded state.

    Arrival order is made deterministic with one file per micro-batch
    (maxFilesPerTrigger=1, mtime-ordered, the s12 pattern):

      batch 1  events with ts >= 2024-01-16 (on time).
      batch 2  a single '_bridge' row (2024-02-14): Spark >= 3.4 filters
               late events with the PREVIOUS micro-batch's watermark
               (lateEvents wm lags eviction wm by one batch — verified
               empirically on this engine), so one bridge batch is
               needed before the watermark from batch 1's data governs
               input filtering.
      batch 3  events with ts <  2024-01-16 — entirely late; append
               mode must discard all of them (the engine reports them
               via numRowsDroppedByWatermark). availableNow then runs a
               final no-data batch whose watermark (2024-02-14, from the
               bridge) closes every January window, so they all emit;
               the bridge's own window ends past that watermark and
               never appears.

    Oracle: the daily per-type aggregate over ONLY the on-time slice —
    if any late row survived (or any on-time row was dropped), counts
    or decimal-exact sums diverge.
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (dsum, stage_day_files,
                                              stream_state_partitions, t)
    from etl_docker_spark.streaming import tumbling_aggregate

    ev = t(spark, sf, "events").select("ts", "event_type", "value")
    on_time = ev.filter(F.col("ts") >= F.lit(_S13_SPLIT).cast("timestamp"))
    late = ev.filter(F.col("ts") < F.lit(_S13_SPLIT).cast("timestamp"))

    def one_row(ts: str, etype: str):
        return spark.createDataFrame(
            [(etype, 0.0)], "event_type string, value double").select(
            F.lit(ts).cast("timestamp").alias("ts"), "event_type", "value")

    bridge = one_row(_S13_BRIDGE, "_bridge")

    work = tempfile.mkdtemp(prefix="s13_")
    try:
        # one parallel staging job, one file per arrival slot (pidx IS
        # the batch index: on_time, bridge, late) — the serial
        # coalesce(1)-per-part loop this replaces additionally collapsed
        # each part's scan+filter into a single task (optimization r12;
        # same finding-2 shape as the r11 stage_day_files port)
        parts = (on_time.withColumn("pidx", F.lit(0))
                 .unionByName(bridge.withColumn("pidx", F.lit(1)))
                 .unionByName(late.withColumn("pidx", F.lit(2))))
        arrivals = stage_day_files(parts, work, day_col="pidx")

        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = tumbling_aggregate(
            stream, "1 day",
            {"n_events": F.count("*"), "total_value": dsum("value")},
            keys=["event_type"], watermark="0 seconds")
        name = f"s13_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (agg.writeStream.outputMode("append").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return (spark.table(name)
                .filter(F.col("event_type") != "_bridge")
                .select(F.col("window_start").alias("day"), "event_type",
                        "n_events", "total_value")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S13_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM events
WHERE ts >= TIMESTAMP '{_S13_SPLIT} 00:00:00'
GROUP BY 1, 2
"""

ROUND4.update({
    "s13_stream_late_data_drop": (s13_stream_late_data_drop, S13_SQL),
})

# ---------------------------------------------------------------- g05

_G05_DEPTH = 7     # covers part keys < 10^6 at any corpus scale here
_G05_TOP = 100     # report the top three levels (nodes 0..99)


def g05_hierarchy_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical subtree rollup over an N-ary hierarchy encoded in the
    part key (parent = p_partkey div 10 — node k's children are
    10k..10k+9, root 0): per top-level node, descendant count and
    DECIMAL-exact subtree retail value.

    The Spark-first shape for FIXED-DEPTH hierarchies (org charts,
    category trees, chart-of-accounts): instead of an iterative
    bottom-up loop (depth x shuffles), each row explodes into its <= 7
    ancestor prefixes — path enumeration — and one map-side-combinable
    aggregation rolls every subtree up in a single shuffle of
    (node, value) pairs. 100 TB shape: explode factor = tree depth (a
    constant), the filter to reported nodes pushes below the aggregate,
    and no iteration barriers exist at all. Unbounded-depth hierarchies
    fall back to g03's iterative-BFS machinery; depth here is a declared
    bound, asserted in the plan (keys >= 10^7 would silently truncate).
    """
    from etl_docker_spark.plans._util import dsum, t

    part = t(spark, sf, "part").select("p_partkey", "p_retailprice")
    ancestors = F.array_distinct(F.array(
        *[F.expr(f"p_partkey div {10 ** k}") for k in range(_G05_DEPTH)]))
    anc = (part.select("p_retailprice", F.explode(ancestors).alias("node"))
           .filter(F.col("node") < _G05_TOP))
    depth = (F.when(F.col("node") == 0, F.lit(0))
             .otherwise(F.length(F.col("node").cast("string")))
             .cast("long"))
    return (anc.groupBy("node")
            .agg(F.count("*").alias("n_desc"),
                 dsum("p_retailprice").alias("subtree_value"))
            .select("node", depth.alias("depth"), "n_desc",
                    "subtree_value"))


G05_SQL = f"""
WITH anc AS (
  SELECT p_retailprice,
         unnest(list_distinct([
           {", ".join(f"p_partkey // {10 ** k}" for k in range(_G05_DEPTH))}
         ])) AS node
  FROM part
)
SELECT node,
       CAST(CASE WHEN node = 0 THEN 0
                 ELSE length(CAST(node AS VARCHAR)) END AS BIGINT) AS depth,
       COUNT(*) AS n_desc,
       CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS VARCHAR)
            AS DOUBLE) AS subtree_value
FROM anc
WHERE node < {_G05_TOP}
GROUP BY node
"""

ROUND4.update({
    "g05_hierarchy_rollup": (g05_hierarchy_rollup, G05_SQL),
})

# ---------------------------------------------------------------- e19

_E19_SHORTLIST = 32   # ADC candidates refined per query
_E19_K = 5            # exact-ranked results returned


def e19_adc_exact_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage PQ serving: e10's compressed ADC scan shortlists 32
    candidates per query, then ONLY those 32 rows are re-ranked by exact
    cosine against the raw embeddings — the standard shortlist+refine
    pipeline every production PQ deployment runs (compressed codes for
    the corpus-wide scan, exact math for the handful that matter).

    Scale shape: stage 1 never touches raw vectors (e10's 4 broadcast
    code-table lookups); stage 2's exact work is bounded at
    shortlist x n_queries rows — the raw-embedding join is a semi-join
    on (neighbor_id) of a k-row frame against the corpus, so refinement
    cost is independent of corpus size. Output pins both ranks: the
    exact order AND where each survivor sat in the ADC order, which is
    the per-query evidence for choosing the shortlist width (a survivor
    with adc_rank near 32 says the shortlist is too narrow).
    """
    from etl_docker_spark.llm.similarity import cosine_expr
    from etl_docker_spark.plans._util import t
    from etl_docker_spark.plans.round2g import _ADC_NQ, _adc_scored

    wq = Window.partitionBy("query_id")
    shortlist = (_adc_scored(spark, sf)
                 .withColumn("adc_rank", F.row_number().over(
                     wq.orderBy(F.asc("adc"), F.asc("neighbor_id")))
                     .cast("long"))
                 .filter(F.col("adc_rank") <= _E19_SHORTLIST)
                 .select("query_id", "neighbor_id", "adc_rank"))
    emb = t(spark, sf, "embeddings")
    qv = (emb.filter(F.col("vec_id") < _ADC_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    nb = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nv"))
    exact = (shortlist.join(nb, "neighbor_id")
             .join(F.broadcast(qv), "query_id")
             .select("query_id", "neighbor_id", "adc_rank",
                     F.round(cosine_expr(F.col("nv"), F.col("qv")), 8)
                     .alias("cosine")))
    return (exact.withColumn("exact_rank", F.row_number().over(
        wq.orderBy(F.desc("cosine"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("exact_rank") <= _E19_K)
        .select("query_id", "neighbor_id", "cosine", "exact_rank",
                "adc_rank"))


def _e19_sql() -> str:
    from etl_docker_spark.plans.round2g import (_ADC_NQ, _PQ_SUBS,
                                                _adc_dt_sql, _pq_sub_sql)

    dot = ("list_reduce(list_transform(generate_series(1, len({a})), "
           "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
           "(x, y) -> x + y)")
    return (
        "WITH " + ",".join(_pq_sub_sql(s) for s in range(_PQ_SUBS))
        + "," + ",".join(_adc_dt_sql(s) for s in range(_PQ_SUBS))
        + f""",
codes AS (
  SELECT vec_id, code0, code1, code2, code3
  FROM code_0 JOIN code_1 USING (vec_id)
  JOIN code_2 USING (vec_id) JOIN code_3 USING (vec_id)
),
scored AS (
  SELECT d0.query_id, c.vec_id AS neighbor_id,
         d0.d + d1.d + d2.d + d3.d AS adc
  FROM codes c
  JOIN dt_0 d0 ON d0.code = c.code0
  JOIN dt_1 d1 ON d1.query_id = d0.query_id AND d1.code = c.code1
  JOIN dt_2 d2 ON d2.query_id = d0.query_id AND d2.code = c.code2
  JOIN dt_3 d3 ON d3.query_id = d0.query_id AND d3.code = c.code3
  WHERE c.vec_id <> d0.query_id
),
shortlist AS (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc, neighbor_id) AS BIGINT)
           AS adc_rank
  FROM scored
  QUALIFY adc_rank <= {_E19_SHORTLIST}
),
exact AS (
  SELECT s.query_id, s.neighbor_id, s.adc_rank,
         round({dot.format(a='n.embedding', b='q.embedding')}
               / sqrt({dot.format(a='n.embedding', b='n.embedding')}
                      * {dot.format(a='q.embedding', b='q.embedding')}),
               8) AS cosine
  FROM shortlist s
  JOIN embeddings n ON n.vec_id = s.neighbor_id
  JOIN embeddings q ON q.vec_id = s.query_id AND q.vec_id < {_ADC_NQ}
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id)
            AS BIGINT) AS exact_rank,
       adc_rank
FROM exact
QUALIFY exact_rank <= {_E19_K}""")


ROUND4.update({
    "e19_adc_exact_rerank": (e19_adc_exact_rerank, _e19_sql()),
})

# ---------------------------------------------------------------- q71


def q71_relational_division(spark: SparkSession, sf: str) -> DataFrame:
    """Relational division ('for all'): per market segment, how many
    ordering customers have placed orders in EVERY priority class that
    exists corpus-wide — the classic division query (suppliers covering
    all regions, users hitting every funnel step) that no other q-entry
    exercises.

    Scale shape: division-by-counting, never division-by-set-difference
    — per-customer distinct-priority counts are a two-level partial
    aggregation on the orders scan (count-distinct over a 5-value
    column collapses map-side), the universe size is a 1-row broadcast,
    and the segment join is a broadcast of the customer dim. ppm share
    via integer div keeps the gate exact.
    """
    from etl_docker_spark.plans._util import t

    orders = t(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.countDistinct("o_orderpriority").alias("n_prio")))
    universe = orders.agg(
        F.countDistinct("o_orderpriority").alias("n_all"))
    cust = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    return (per_cust.crossJoin(F.broadcast(universe))
            .join(F.broadcast(cust), "o_custkey")
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_customers"),
                 F.sum(F.when(F.col("n_prio") == F.col("n_all"), 1)
                       .otherwise(0)).cast("long").alias("n_complete"))
            .withColumn("complete_ppm",
                        F.expr("1000000 * n_complete div n_customers")))


Q71_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_prio
  FROM orders GROUP BY o_custkey
),
universe AS (
  SELECT COUNT(DISTINCT o_orderpriority) AS n_all FROM orders
)
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN p.n_prio = u.n_all THEN 1 ELSE 0 END) AS BIGINT)
         AS n_complete,
       1000000 * CAST(SUM(CASE WHEN p.n_prio = u.n_all THEN 1 ELSE 0 END)
                      AS BIGINT) // COUNT(*) AS complete_ppm
FROM per_cust p, universe u
JOIN customer c ON c.c_custkey = p.o_custkey
GROUP BY 1, u.n_all
"""

ROUND4.update({
    "q71_relational_division": (q71_relational_division, Q71_SQL),
})

# ---------------------------------------------------------------- d46

_D46_H = 16   # signature width (d06's default)


def d46_minhash_estimation_error(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash estimator-bias audit: for every verified near-dup pair
    (d06), the Jaccard the 16-lane signature ESTIMATES (matching lanes /
    16) against the exact hashed-shingle Jaccard — the per-pair error
    that prices the signature width. d45 audits detector AGREEMENT
    (minhash vs simhash); this audits the estimator itself: a 16-hash
    signature quantizes Jaccard to 1/16 steps, and err_ppm is the
    evidence for widening (or narrowing) the signature at 100 TB, where
    signature width IS the shuffle width of the dedup pass.

    Scale shape: the pair frame is the memoized d06 graph (no second
    corpus pass for candidates); signatures are recomputed only for
    documents that appear in a pair (left-semi pushdown before the
    shingle explode), so the audit's cost scales with the DUPLICATE
    population, not the corpus.
    """
    from etl_docker_spark.llm.dedup import (MINHASH_COEFFS, MINHASH_P,
                                            _base_hash, shingle_rows)
    from etl_docker_spark.plans._util import t
    from etl_docker_spark.plans.llm_queries import minhash_pairs_frame

    pairs = minhash_pairs_frame(spark, sf)
    ids = (pairs.select(F.col("doc_a").alias("doc_id"))
           .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
           .distinct())
    docs = (t(spark, sf, "documents").select("doc_id", "text")
            .join(ids, "doc_id", "left_semi"))
    hashed = (shingle_rows(docs, "doc_id", "text", 3)
              .select("doc", _base_hash(F.col("s")).alias("h")))
    sig = hashed.groupBy("doc").agg(
        *[F.min((F.lit(MINHASH_COEFFS[j][0]) * F.col("h")
                 + F.lit(MINHASH_COEFFS[j][1])) % F.lit(MINHASH_P))
          .alias(f"mh{j}") for j in range(_D46_H)])
    sa = sig.select(F.col("doc").alias("doc_a"),
                    *[F.col(f"mh{j}").alias(f"a{j}") for j in range(_D46_H)])
    sb = sig.select(F.col("doc").alias("doc_b"),
                    *[F.col(f"mh{j}").alias(f"b{j}") for j in range(_D46_H)])
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(_D46_H))
    return (pairs.join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .select("doc_a", "doc_b",
                    F.expr("1000000 * inter_n div union_n")
                    .alias("exact_ppm"),
                    (F.lit(1_000_000) * matches.cast("long")
                     / F.lit(_D46_H)).cast("long").alias("est_ppm"))
            .withColumn("err_ppm",
                        F.abs(F.col("est_ppm") - F.col("exact_ppm"))))


def _d46_sql() -> str:
    from etl_docker_spark.plans.llm_queries import D06_SQL, _MH_COLS

    lanes = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)"
        for j in range(_D46_H))
    return f"""
WITH pairs AS ({D06_SQL}),
ids AS (
  SELECT DISTINCT doc_a AS doc_id FROM pairs
  UNION SELECT DISTINCT doc_b FROM pairs
),
toks2 AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS tk
  FROM documents d JOIN ids USING (doc_id)
),
sh2 AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - 2, 1)),
             i -> array_to_string(tk[i:i+2], ' '))) AS sh
  FROM toks2
),
hashed2 AS (
  SELECT doc_id,
         list_transform(sh, s -> CAST('0x' || substring(md5(s), 1, 8)
                                      AS BIGINT)) AS hh
  FROM sh2
),
sig AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM hashed2
)
SELECT p.doc_a, p.doc_b,
       1000000 * p.inter_n // p.union_n AS exact_ppm,
       CAST(1000000 * ({lanes}) / {_D46_H} AS BIGINT) AS est_ppm,
       abs(CAST(1000000 * ({lanes}) / {_D46_H} AS BIGINT)
           - 1000000 * p.inter_n // p.union_n) AS err_ppm
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b
"""


ROUND4.update({
    "d46_minhash_estimation_error": (d46_minhash_estimation_error,
                                     _d46_sql()),
})

# ---------------------------------------------------------------- s14

_S14_CUTOFF = "2024-01-11"   # first 10 event days -> 10 micro-batches
_S14_TTL_DAYS = 3


def s14_stream_ttl_eviction(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful TTL EVICTION under the oracle gate: per-(user, event_type)
    running totals through applyInPandasWithState where a key idle past
    the event-time TTL has its state REMOVED — on an unbounded key space
    this eviction is the only thing keeping streaming state bounded, and
    no other s-query pins it (s03 keeps state forever; s13 pins the
    late-INPUT drop, this pins the state-side eviction).

    One file per calendar day (day-truncated ts, integer cents) feeds
    10 deterministic micro-batches. Empirically pinned eviction timing
    on this engine (see tests and the s13 lag note): the timeout fires
    in the first data-less batch whose watermark STRICTLY exceeds
    last_ts + ttl, and the watermark during the day-X batch is day X-1
    (one-batch lag). With midnight-aligned days and every day present,
    a key's state therefore restarts before activity day E iff
    E >= last_activity + ttl_days + 3 — a pure day-arithmetic rule the
    batch oracle replays: per key, totals of the FINAL surviving state
    segment as of its last emission. Keys that idle out after their
    last activity keep their last emitted row (eviction emits nothing),
    which the oracle reproduces by construction.

    Integer-cents totals (pandas int64 sums) keep cross-engine equality
    exact — float accumulation order would diverge in the last ulp.
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions, t)
    from etl_docker_spark.streaming.stateful import keyed_ttl_totals

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S14_CUTOFF).cast("timestamp"))
          .select(
              F.concat_ws(":", F.col("user_id").cast("string"),
                          "event_type").alias("state_key"),
              F.date_trunc("day", F.col("ts")).alias("ts"),
              F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
              F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
              .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s14_")
    try:
        arrivals = stage_day_files(ev, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        out = keyed_ttl_totals(
            stream, ttl_ms=_S14_TTL_DAYS * 86_400_000)
        name = f"s14_sink_{abs(hash(sf)) % 10 ** 8}"
        # Python stateful operator: the update fn runs once per key per
        # batch, so state partitions must scale with the KEY population —
        # which outnumbers cores at every gate size — not with source
        # bytes (the windowed queries' heuristic). 4 partitions
        # serialized 750k per-key invocations into 185 s at ~sf1; core
        # count is the measured sweet spot (SCALE.md: past ~2x cores,
        # task scheduling + state-store commits win back the losses).
        with stream_state_partitions(
                spark, spark.sparkContext.defaultParallelism):
            q = (out.writeStream.outputMode("update").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        w = Window.partitionBy("state_key").orderBy(F.desc("last_ts"))
        return (spark.table(name)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select("state_key", "n_events", "total_cents", "last_ts")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S14_SQL = f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS state_key,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE ts < TIMESTAMP '{_S14_CUTOFF} 00:00:00'
),
dd AS (SELECT DISTINCT state_key, d FROM ev),
lg AS (
  SELECT state_key, d,
         CASE WHEN lag(d) OVER w IS NULL THEN 0
              WHEN d >= lag(d) OVER w
                        + INTERVAL {_S14_TTL_DAYS + 3} DAY THEN 1
              ELSE 0 END AS restart
  FROM dd WINDOW w AS (PARTITION BY state_key ORDER BY d)
),
grp AS (
  SELECT state_key, d,
         SUM(restart) OVER (PARTITION BY state_key ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS g
  FROM lg
),
lastg AS (SELECT state_key, MAX(g) AS g FROM grp GROUP BY state_key),
seg AS (SELECT grp.state_key, grp.d FROM grp JOIN lastg USING (state_key, g))
SELECT e.state_key,
       COUNT(*) AS n_events,
       CAST(SUM(e.cents) AS BIGINT) AS total_cents,
       MAX(e.d) AS last_ts
FROM ev e JOIN seg USING (state_key, d)
GROUP BY e.state_key
"""

ROUND4.update({
    "s14_stream_ttl_eviction": (s14_stream_ttl_eviction, S14_SQL),
})

# ---------------------------------------------------------------- e20

_E20_WIDTHS = (5, 10, 32)   # shortlist widths priced against exact top-5
_E20_K = 5


def e20_rerank_recall_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """The shortlist-width dial, priced: for each ADC shortlist width R,
    recall@5 of the two-stage pipeline (e19's shape — ADC top-R, exact
    re-rank, take 5) against the exact scan (e01). This is the number a
    deployment reads to size R: wider shortlists cost exact-distance
    work linearly but recover recall the compressed codes lost. One
    candidate frame serves all widths — cosines are computed once for
    the widest shortlist, then each width is a filter + per-query rank
    over <= 32 rows (partitioned windows; nothing global).
    """
    from etl_docker_spark.llm.similarity import brute_force_knn, cosine_expr
    from etl_docker_spark.plans._util import t
    from etl_docker_spark.plans.round2g import _ADC_NQ, _adc_scored

    emb = t(spark, sf, "embeddings")
    wq = Window.partitionBy("query_id")
    shortlist = (_adc_scored(spark, sf)
                 .withColumn("adc_rank", F.row_number().over(
                     wq.orderBy(F.asc("adc"), F.asc("neighbor_id")))
                     .cast("long"))
                 .filter(F.col("adc_rank") <= max(_E20_WIDTHS)))
    nb = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nv"))
    qv = (emb.filter(F.col("vec_id") < _ADC_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    cand = (shortlist.join(nb, "neighbor_id")
            .join(F.broadcast(qv), "query_id")
            .select("query_id", "neighbor_id", "adc_rank",
                    F.round(cosine_expr(F.col("nv"), F.col("qv")), 8)
                    .alias("cosine"))
            .localCheckpoint())
    exact = (brute_force_knn(emb, emb.filter(F.col("vec_id") < _ADC_NQ),
                             k=_E20_K)
             .select("query_id", "neighbor_id"))
    out = None
    for r in _E20_WIDTHS:
        rr = (cand.filter(F.col("adc_rank") <= r)
              .withColumn("rn", F.row_number().over(
                  wq.orderBy(F.desc("cosine"), F.asc("neighbor_id"))))
              .filter(F.col("rn") <= _E20_K)
              .select("query_id", "neighbor_id"))
        m = (exact.join(rr, ["query_id", "neighbor_id"])
             .agg(F.count("*").alias("total_matched"))
             .select(F.lit(r).cast("long").alias("shortlist_width"),
                     F.col("total_matched").cast("long"),
                     F.expr(f"total_matched * 1000000 div "
                            f"({_ADC_NQ} * {_E20_K})").alias("recall_ppm")))
        out = m if out is None else out.unionByName(m)
    return out


def _e20_sql() -> str:
    from etl_docker_spark.plans.round2g import (_ADC_NQ, _PQ_SUBS,
                                                _adc_dt_sql, _pq_sub_sql)

    dot = ("list_reduce(list_transform(generate_series(1, len({a})), "
           "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
           "(x, y) -> x + y)")
    width_rows = "\nUNION ALL\n".join(f"""
SELECT CAST({r} AS BIGINT) AS shortlist_width,
       CAST((SELECT COUNT(*) FROM exact5 e
             JOIN rr_{r} USING (query_id, neighbor_id)) AS BIGINT)
         AS total_matched,
       (SELECT COUNT(*) FROM exact5 e
        JOIN rr_{r} USING (query_id, neighbor_id)) * 1000000
         // ({_ADC_NQ} * {_E20_K}) AS recall_ppm""" for r in _E20_WIDTHS)
    rr_ctes = ",".join(f"""
rr_{r} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rn
    FROM cand WHERE adc_rank <= {r}
  ) WHERE rn <= {_E20_K}
)""" for r in _E20_WIDTHS)
    return (
        "WITH " + ",".join(_pq_sub_sql(s) for s in range(_PQ_SUBS))
        + "," + ",".join(_adc_dt_sql(s) for s in range(_PQ_SUBS))
        + f""",
codes AS (
  SELECT vec_id, code0, code1, code2, code3
  FROM code_0 JOIN code_1 USING (vec_id)
  JOIN code_2 USING (vec_id) JOIN code_3 USING (vec_id)
),
scored AS (
  SELECT d0.query_id, c.vec_id AS neighbor_id,
         d0.d + d1.d + d2.d + d3.d AS adc
  FROM codes c
  JOIN dt_0 d0 ON d0.code = c.code0
  JOIN dt_1 d1 ON d1.query_id = d0.query_id AND d1.code = c.code1
  JOIN dt_2 d2 ON d2.query_id = d0.query_id AND d2.code = c.code2
  JOIN dt_3 d3 ON d3.query_id = d0.query_id AND d3.code = c.code3
  WHERE c.vec_id <> d0.query_id
),
sl AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS adc_rank
  FROM scored QUALIFY adc_rank <= {max(_E20_WIDTHS)}
),
cand AS (
  SELECT s.query_id, s.neighbor_id, s.adc_rank,
         round({dot.format(a='n.embedding', b='q.embedding')}
               / sqrt({dot.format(a='n.embedding', b='n.embedding')}
                      * {dot.format(a='q.embedding', b='q.embedding')}),
               8) AS cosine
  FROM sl s
  JOIN embeddings n ON n.vec_id = s.neighbor_id
  JOIN embeddings q ON q.vec_id = s.query_id
),
exact5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {dot.format(a='q.embedding', b='e.embedding')}
               / sqrt({dot.format(a='q.embedding', b='q.embedding')}
                      * {dot.format(a='e.embedding', b='e.embedding')})
               DESC, e.vec_id) AS rank
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id < {_ADC_NQ}) q
    WHERE e.vec_id <> q.vec_id
  ) WHERE rank <= {_E20_K}
),{rr_ctes}
{width_rows}""")


ROUND4.update({
    "e20_rerank_recall_sweep": (e20_rerank_recall_sweep, _e20_sql()),
})

# ---------------------------------------------------------------- s15

_S15_CUTOFF = "2024-01-11"  # same 10-day / 10-batch feed as s14
_S15_GAP_DAYS = 3


def s15_stream_session_close(spark: SparkSession, sf: str) -> DataFrame:
    """EMIT-ON-TIMEOUT sessionization, gated — the inverse output
    discipline of s14: data batches are absorbed into per-key session
    state SILENTLY, and the only rows the sink ever receives come from
    the timeout handler, when the watermark passes session_end + gap.
    The state store holds exactly the open sessions; the sink holds
    exactly the closed ones. This is the streaming shape of
    gaps-and-islands sessionization (q22/q45's batch twin) and the last
    classic stateful output pattern the surface didn't pin.

    Deterministic closure rule on the 10-day file-per-batch feed,
    derived from the empirically-pinned timing (strict-inequality
    timeout + one-batch watermark lag, midnight-aligned days; verified
    again for the emission path with a targeted prototype):

      - a session followed by more key activity (gap >= gap_days + 3,
        s14's split rule) closed mid-stream — always emitted;
      - a key's LAST session closes only if the END-OF-STREAM watermark
        (the last data day, via availableNow's final no-data batch)
        strictly exceeds session_end + gap — i.e. end <= day 6 here;
        later sessions stay open and are never emitted (a real
        pipeline resumes them from the checkpoint on the next run).

    The oracle replays exactly that: sessionize activity days by the
    split rule, keep non-last sessions plus last sessions ending by
    day 6, aggregate events per session.
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions, t)
    from etl_docker_spark.streaming.stateful import session_close_stream

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S15_CUTOFF).cast("timestamp"))
          .select(
              F.concat_ws(":", F.col("user_id").cast("string"),
                          "event_type").alias("state_key"),
              F.date_trunc("day", F.col("ts")).alias("ts"),
              F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
              F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
              .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s15_")
    try:
        arrivals = stage_day_files(ev, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        out = session_close_stream(
            stream, gap_ms=_S15_GAP_DAYS * 86_400_000)
        name = f"s15_sink_{abs(hash(sf)) % 10 ** 8}"
        # per-key Python stateful operator: partitions scale with the key
        # population (= cores; see s14 and the SCALE.md partition curve)
        with stream_state_partitions(
                spark, spark.sparkContext.defaultParallelism):
            q = (out.writeStream.outputMode("update").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return (spark.table(name)
                .select("state_key", "session_start", "session_end",
                        "n_events", "total_cents")
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


S15_SQL = f"""
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS state_key,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE ts < TIMESTAMP '{_S15_CUTOFF} 00:00:00'
),
dd AS (SELECT DISTINCT state_key, d FROM ev),
lg AS (
  SELECT state_key, d,
         CASE WHEN lag(d) OVER w IS NULL THEN 0
              WHEN d >= lag(d) OVER w
                        + INTERVAL {_S15_GAP_DAYS + 3} DAY THEN 1
              ELSE 0 END AS restart
  FROM dd WINDOW w AS (PARTITION BY state_key ORDER BY d)
),
grp AS (
  SELECT state_key, d,
         SUM(restart) OVER (PARTITION BY state_key ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS g
  FROM lg
),
lastd AS (SELECT MAX(d) AS last_day FROM ev),
sessions AS (
  SELECT state_key, g, MIN(d) AS session_start, MAX(d) AS session_end
  FROM grp GROUP BY state_key, g
),
closed AS (
  SELECT s.state_key, s.g, s.session_start, s.session_end
  FROM sessions s, lastd
  WHERE s.g < (SELECT MAX(g) FROM sessions s2
               WHERE s2.state_key = s.state_key)
     OR lastd.last_day > s.session_end + INTERVAL {_S15_GAP_DAYS} DAY
)
SELECT c.state_key, c.session_start, c.session_end,
       COUNT(*) AS n_events, CAST(SUM(e.cents) AS BIGINT) AS total_cents
FROM closed c
JOIN grp ON grp.state_key = c.state_key AND grp.g = c.g
JOIN ev e ON e.state_key = c.state_key AND e.d = grp.d
GROUP BY c.state_key, c.session_start, c.session_end
"""

ROUND4.update({
    "s15_stream_session_close": (s15_stream_session_close, S15_SQL),
})
