"""Round-6 queries, second batch: the adversarial shared-prefix corpus
for the exact-Jaccard filter stack (d57 — VERDICT r5 item 5), and the
streaming additions (s27 state change feed, s28 idempotent foreachBatch
sink).

d57's corpus is constructed INSIDE the query from doc_id alone (both
engines build the identical token sequences by integer arithmetic + md5),
so the adversarial measurement is itself oracle-gated, and the same
builder scales with the corpus for the SCALE.md stress table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND6B: dict = {}

# ---------------------------------------------------------------- d57

_D57_GROUP = 5        # docs per shared-prefix group
_D57_GTOKS = 29       # tokens in the group-shared block
_D57_TRIPLES = 60     # pool triples drawn per doc
_D57_POOL_X = 4       # pool size = 4x corpus size (keeps dfreq ~15 at any N)
_D57_CLONE_MOD = 50   # doc_id % 50 == 1 -> clone of doc_id - 1
_D57_K = 256          # the K auto-sizing must pick here: ~330-token sets,
                      # nearest pow2 in log space (pinned by
                      # tests/test_round6.py::test_d57_auto_k_matches_rule)
_D57_GATE_DOCS = 2000  # gate-corpus cap: the GATE pins exactness, which a
                       # bounded corpus fully exercises (q91's slice idiom);
                       # full-corpus candidate VOLUME is the stress
                       # harness's job (tools/stress_d57.py -> SCALE.md)


def d57_adversarial_tokens_spark() -> str:
    """Spark SQL expression for the adversarial token array, given
    columns `eid` (clone-resolved id), `gid` (group id) and `pool`
    (pool size). Layout per doc:

      g<gid>_1 .. g<gid>_29  s<r1>a s<r1>b s<r1>c x y  s<r2>a ... x y

    - the group block's 27 internal 3-shingles have dfreq = GROUP (5):
      the RAREST shingles in the doc, so they fill the front of every
      prefix — every same-group pair is forced to collide (the "heavy
      shared prefix" the round-5 verdict asked to stress);
    - each pool triple contributes 5 shingles, every one a function of
      ONE triple (the x/y separators insulate junctions), so own-content
      shingles all have dfreq ~ 60N/pool = 15: common enough to sort
      AFTER the group block, rare enough to stay subquadratic;
    - clones (doc_id % 50 == 1 reuses doc_id-1's draws) are the true
      duplicates the stack must still return exactly.
    """
    r = ("CAST(pmod(CAST(conv(substring(md5(CAST(eid * 100 + j AS STRING)), "
         "1, 8), 16, 10) AS BIGINT), pool) AS STRING)")
    return (
        "concat("
        f"transform(sequence(1, {_D57_GTOKS}), "
        "j -> concat('g', CAST(gid AS STRING), '_', CAST(j AS STRING))), "
        f"flatten(transform(sequence(1, {_D57_TRIPLES}), j -> array("
        f"concat('s', {r}, 'a'), concat('s', {r}, 'b'), "
        f"concat('s', {r}, 'c'), 'x', 'y'))))"
    )


def d57_adversarial_frame(spark: SparkSession, sf: str,
                          cap: int | None = None) -> DataFrame:
    """(doc_id, text) with the adversarial construction — shared by the
    gate query (bounded corpus) and the SCALE.md stage-count stress
    harness (full corpus: cap=None)."""
    docs = t(spark, sf, "documents").select("doc_id")
    if cap is not None:
        docs = docs.filter(F.col("doc_id") < cap)
    # spread the generator projection across the session's full width:
    # the ~0.3 ms/doc of md5 token synthesis otherwise rides however few
    # input splits survive the filter (measured: the whole 2000-doc gate
    # corpus generated in ONE 0.65 s task). Deterministic hash key, an
    # 8-byte/row exchange. (optimization r12)
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id"))
    n = docs.agg((F.count("*") * _D57_POOL_X).alias("pool"))
    base = (docs.crossJoin(F.broadcast(n))
            .withColumn("eid", F.expr(
                f"IF(doc_id % {_D57_CLONE_MOD} = 1, doc_id - 1, doc_id)"))
            .withColumn("gid", F.expr(f"doc_id DIV {_D57_GROUP}")))
    return base.select(
        "doc_id",
        F.array_join(F.expr(d57_adversarial_tokens_spark()), " ")
        .alias("text"))


def d57_shared_prefix_stress(spark: SparkSession, sf: str) -> DataFrame:
    """The PPJoin+ stack (prefix -> positional -> suffix, d47/d49/d53)
    run on an ADVERSARIAL corpus built to defeat the filters — the
    round-5 verdict's item 5. Every 5-doc group shares a 29-token block
    whose shingles are the rarest in each member (dfreq 5 vs ~15), so
    they front-load every prefix: all C(5,2) x N/5 same-group pairs are
    forced prefix candidates, their first match is at position ~0 (so
    the positional bound ~ the doc size never prunes), and their
    suffixes are equal-size disjoint-but-interleaved pool sets — the
    worst case for any COARSE counting bound: with K << |set| the two
    histograms are statistically indistinguishable from each other
    (measured: K=16 prunes 0 of 37,392 forced candidates at sf0.01).
    The measured design rule this corpus established (SCALE.md stress
    table): size K to the typical SET SIZE, so per-bucket counts are
    ~0/1 and min-summing approaches true-intersection counting — at
    K=256 (~330-token sets) the bound prunes 37,392 -> 10, exactly the
    true pairs. That K is still a fixed 256-int sketch (d53's
    fixed-width-shuffle story, one byte-width step up), NOT the full
    token array. The stack's EXACTNESS is what this query gates: output
    must be exactly the true J >= 1/2 pairs (the 1-per-50 clones) with
    every forced candidate eliminated, never returned. Candidate volume
    is linear in N by construction (group size and per-triple dfreq are
    corpus-size-invariant), so the stress table's ratios measure the
    filters, not the corpus.
    """
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    adv = d57_adversarial_frame(spark, sf, cap=_D57_GATE_DOCS) \
        .localCheckpoint()
    # "auto" resolves to _D57_K on this corpus (test-pinned): the design
    # rule this query established is now the default sizing path.
    return prefix_filter_jaccard_pairs(
        adv, "doc_id", "text", shingle_n=3, t_num=1, t_den=2,
        positional=True, suffix_buckets="auto")


def _d57_sql() -> str:
    r = ("CAST(CAST('0x' || substring(md5(CAST(eid * 100 + j AS VARCHAR)), "
         "1, 8) AS BIGINT) % pool AS VARCHAR)")
    tokens = (
        "list_concat("
        f"list_transform(generate_series(1, {_D57_GTOKS}), "
        "j -> 'g' || CAST(gid AS VARCHAR) || '_' || CAST(j AS VARCHAR)), "
        f"flatten(list_transform(generate_series(1, {_D57_TRIPLES}), "
        f"j -> ['s' || {r} || 'a', 's' || {r} || 'b', "
        f"'s' || {r} || 'c', 'x', 'y'])))"
    )
    return f"""
WITH capped AS (
  SELECT doc_id FROM documents WHERE doc_id < {_D57_GATE_DOCS}
),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_D57_CLONE_MOD} = 1 THEN doc_id - 1
              ELSE doc_id END AS eid,
         doc_id // {_D57_GROUP} AS gid,
         (SELECT {_D57_POOL_X} * COUNT(*) FROM capped) AS pool
  FROM capped
),
toks AS (
  SELECT doc_id, {tokens} AS tk FROM base
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(tk) - 2, 1)),
           i -> array_to_string(tk[i:i+2], ' '))) AS sh
  FROM toks
),
hs AS (
  SELECT doc_id,
         list_distinct(list_transform(
           sh, s -> CAST('0x' || substring(md5(s), 1, 8) AS BIGINT))) AS hs
  FROM sh
),
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


ROUND6B.update({
    "d57_shared_prefix_stress": (d57_shared_prefix_stress, _d57_sql()),
})

# ---------------------------------------------------------------- s27/s28

_S27_CUTOFF = "2024-01-11"  # the s14/s15/s26 10-day feed


def _stage_daily_arrivals(spark: SparkSession, sf: str, work: str) -> str:
    """Stage the events feed as one parquet file per day with ascending
    mtimes (s18/s26's arrival discipline), so `maxFilesPerTrigger=1`
    replays it as one deterministic micro-batch per day: file i IS
    batch i. Returns the arrivals dir.

    One-file-per-day comes from `repartition(dcol)` — each day's rows
    land wholly in one task, so each partition DIRECTORY gets exactly
    one file, while distinct days still write in parallel (the
    coalesce(1) idiom serializes the whole feed through a single task:
    ~10 s per rep per query at ~sf1, measured)."""
    import os
    import shutil

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S27_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.round(F.col("value") * 100, 0).cast("long")
                  .alias("cents"),
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))
    staged = os.path.join(work, "staged")
    ev.repartition(F.col("dcol")).write.partitionBy("dcol") \
        .mode("overwrite").parquet(staged)
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals)
    days = sorted(d for d in os.listdir(staged) if d.startswith("dcol="))
    for i, d in enumerate(days):
        src_dir = os.path.join(staged, d)
        matches = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        if len(matches) != 1:
            # a foreign maxRecordsPerFile (or any future write-path change)
            # splitting a day into multiple files must fail HERE, not as a
            # confusing downstream mismatch in the s27/s28/s29 gates
            raise RuntimeError(
                f"expected exactly one parquet file per day in {src_dir}, "
                f"found {matches}")
        dst = os.path.join(arrivals, f"{i:03d}.parquet")
        shutil.copyfile(os.path.join(src_dir, matches[0]), dst)
        os.utime(dst, (1700000000 + i * 60,) * 2)
    return arrivals


def s27_state_changefeed(spark: SparkSession, sf: str) -> DataFrame:
    """State CHANGE FEED introspection (`readChangeFeed` on the state
    data source, native in this Spark 4.1 build — found by the round-6
    probe): after the availableNow day-windowed run, read every state
    transition the job ever committed — (batch_id, change_type, key,
    value) — and gate the per-key LIFECYCLE: in which batch each
    (day, event_type) group was first written, how many times it was
    rewritten, the final buffered aggregate, and whether the watermark
    evicted it. s26 snapshots the END state (open windows only); this
    reads the state's HISTORY, the primitive for debugging watermark
    bugs and sizing state churn (how many keys rewrite per batch =
    changelog volume a RocksDB-changelog checkpoint would upload).

    The feed's determinism comes from the arrival discipline: one file
    per day in mtime order + maxFilesPerTrigger=1 means day i's groups
    are touched exactly once, in batch i — so first_update_batch equals
    the day index and n_updates is 1, both oracle-computable. Evicted
    == NOT open, the exact complement of s26's HAVING clause. The state
    key keeps PHYSICAL names (`window`, `count`), read under the same
    provider conf as the write (s26's lessons).

    Found by this query: the change feed replays per-batch CHANGELOGS,
    which the RocksDB provider only writes under changelog
    checkpointing — so that knob is not just an upload-cost dial (the
    ~sf1 negative result in SCALE.md), it is a PREREQUISITE for change
    feed introspection. Scoped on here for the run + read.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (scoped_conf,
                                              stream_state_partitions)

    work = tempfile.mkdtemp(prefix="s27_")
    try:
        arrivals = _stage_daily_arrivals(spark, sf, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.withWatermark("ts", "1 minute")
               .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
               .agg(F.count("*").cast("long").alias("n_events")))
        ckpt = os.path.join(work, "ckpt")
        changelog_key = ("spark.sql.streaming.stateStore.rocksdb."
                        "changelogCheckpointing.enabled")
        with stream_state_partitions(spark, 4), \
                scoped_conf(spark, changelog_key, "true"):
            q = (agg.writeStream.outputMode("append").format("noop")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            finished = q.awaitTermination(300)
            q.stop()
            if not finished:
                raise RuntimeError(
                    "s27: availableNow run did not terminate within "
                    "300 s; refusing to read a partial change feed")
            feed = (spark.read.format("statestore")
                    .option("readChangeFeed", "true")
                    .option("changeStartBatchId", "0")
                    .load(ckpt)
                    .localCheckpoint())
        upd = F.col("change_type") == "update"
        return (feed.groupBy(
            F.col("key.window.start").alias("day"),
            F.col("key.event_type").alias("event_type"))
            .agg(F.min(F.when(upd, F.col("batch_id"))).cast("long")
                 .alias("first_update_batch"),
                 F.sum(F.when(upd, 1).otherwise(0)).cast("long")
                 .alias("n_updates"),
                 F.max(F.when(upd, F.col("value.count"))).cast("long")
                 .alias("n_events"),
                 F.bool_or(F.col("change_type") == "delete")
                 .alias("evicted")))
    finally:
        shutil.rmtree(work, ignore_errors=True)


S27_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, ts
  FROM events WHERE ts < TIMESTAMP '{_S27_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev),
idx AS (
  SELECT day, CAST(dense_rank() OVER (ORDER BY day) - 1 AS BIGINT) AS di
  FROM (SELECT DISTINCT day FROM ev)
)
SELECT e.day, e.event_type,
       i.di AS first_update_batch,
       CAST(1 AS BIGINT) AS n_updates,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       e.day + INTERVAL 1 DAY <= wm.w AS evicted
FROM ev e JOIN idx i ON i.day = e.day, wm
GROUP BY e.day, e.event_type, i.di, wm.w
"""

ROUND6B.update({
    "s27_state_changefeed": (s27_state_changefeed, S27_SQL),
})


def s28_foreachbatch_idempotent(spark: SparkSession, sf: str) -> DataFrame:
    """EXACTLY-ONCE custom sink under retry: the foreachBatch +
    batch-id-keyed overwrite pattern — the one streaming sink discipline
    the battery hadn't gated (s18 proves the FILE sink's transaction
    log; this proves the pattern for sinks with NO transaction log,
    which is how Structured Streaming writes to JDBC/KV stores in
    production: make the write a deterministic function of batch_id and
    OVERWRITE, so redelivery after a commit-ack failure is harmless).

    Each update-mode micro-batch lands in its own batch_id-keyed
    directory, then the writer immediately re-applies itself (the
    simulated redelivery — same frame, same batch_id). Read-back then
    RAISES if any (batch_id, key) landed more than once (an append-mode
    sink would double every retried batch); the gated answer takes each
    key's value at its max batch_id — equal to the plain batch
    aggregate, because update mode emits a key's latest running value
    whenever it changes and day d's count is complete within batch d.

    Scale shape: per batch one overwrite of the changed keys only
    (update mode), partitioned by the stream's shuffle partitioning; the
    read-back dedup check groups on (batch, key) — bench-scale bounded,
    and on a cluster it is the sink's own primary-key constraint.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import stream_state_partitions

    work = tempfile.mkdtemp(prefix="s28_")
    try:
        arrivals = _stage_daily_arrivals(spark, sf, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.withWatermark("ts", "1 minute")
               .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
               .agg(F.count("*").cast("long").alias("n_events"),
                    F.sum("cents").alias("total_cents"))
               .select(F.col("w.start").alias("day"), "event_type",
                       "n_events", "total_cents"))
        sink = os.path.join(work, "sink")
        ckpt = os.path.join(work, "ckpt")

        def write_batch(bdf: DataFrame, bid: int) -> None:
            # persist: a foreachBatch frame re-executes its whole
            # micro-batch plan (state-store pass included) on EVERY
            # action — the standard idiom when a batch is written more
            # than once is to cache it so the redelivery re-applies the
            # same computed rows instead of running the batch twice
            out = bdf.withColumn("batch_id", F.lit(bid).cast("long"))
            out.persist()
            try:
                path = os.path.join(sink, f"b={bid}")
                out.write.mode("overwrite").parquet(path)
                # simulated redelivery: the sink must absorb a full
                # re-apply of the same batch without duplicating
                # (idempotence is the OVERWRITE; append here would
                # double the batch)
                out.write.mode("overwrite").parquet(path)
            finally:
                out.unpersist()

        with stream_state_partitions(spark, 4):
            q = (agg.writeStream.outputMode("update")
                 .foreachBatch(write_batch)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            finished = q.awaitTermination(300)
            q.stop()
            if not finished:
                raise RuntimeError(
                    "s28: availableNow run did not terminate within "
                    "300 s; refusing to read a partial sink")
        parts = [os.path.join(sink, d) for d in sorted(os.listdir(sink))]
        parts = [p for p in parts
                 if any(f.endswith(".parquet") for f in os.listdir(p))]
        rows = spark.read.parquet(*parts).localCheckpoint()
        dup = (rows.groupBy("batch_id", "day", "event_type")
               .count().filter("count > 1").count())
        if dup:
            raise RuntimeError(
                f"s28: {dup} (batch, key) rows duplicated — the sink is "
                "not idempotent under redelivery")
        w = Window.partitionBy("day", "event_type") \
            .orderBy(F.desc("batch_id"))
        return (rows.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1")
                .select("day", "event_type", "n_events", "total_cents"))
    finally:
        shutil.rmtree(work, ignore_errors=True)


S28_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
WHERE ts < TIMESTAMP '{_S27_CUTOFF} 00:00:00'
GROUP BY 1, 2
"""

ROUND6B.update({
    "s28_foreachbatch_idempotent": (s28_foreachbatch_idempotent, S28_SQL),
})
