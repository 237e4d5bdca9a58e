"""Advanced / beyond-reference query surface: as-of join, streaming window,
SimHash fingerprinting — each with a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.llm.dedup import simhash_table
from etl_docker_spark.operators.asof import asof_join_backward
from etl_docker_spark.operators.dedup import dedup_first
from etl_docker_spark.plans._util import stream_state_partitions, t
from etl_docker_spark.plans.llm_queries import _DOT, D06_SQL

# ---------------------------------------------------------------- q23 as-of


def q23_asof_last_order(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each event picks up the user's latest order at or before
    the event time. Union+window encoding — one shuffle, no pair blowup."""
    events = t(spark, sf, "events").select(
        "event_id", F.col("user_id"), "ts", "event_type")
    orders = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    # unique right rows per (key, ts): highest orderkey wins (pinned winner)
    orders_u = dedup_first(orders, ["user_id", "o_orderdate"], [F.desc("o_orderkey")])
    out = asof_join_backward(
        events, orders_u, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"])
    return out.select(
        "event_id", "user_id", "ts", "event_type",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_order_total"),
    )


Q23_SQL = """
WITH orders_u AS (
  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       o.o_orderkey AS last_orderkey,
       o.o_totalprice AS last_order_total
FROM events e
ASOF LEFT JOIN orders_u o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""

# ---------------------------------------------------------------- s01 streaming


def _events_stream(spark: SparkSession, sf: str):
    """The events table as a file STREAM, robust to both physical layouts.

    `<sf>/events.parquet` is a single file in the driver's testdata but a
    directory of part-files for generated corpora. The file-stream source
    rejects a bare file path (batch read accepts it), so the file layout
    goes through a pathGlobFilter on the parent dir; the directory layout
    streams the directory itself — a glob filter there would match nothing
    and SILENTLY produce an empty stream.
    """
    import os

    from pyspark.sql import types as T

    path = f"{sf}/events.parquet"
    is_dir = os.path.isdir(path)
    # schema from a batch probe (footer read), not hardcoded: the driver's
    # testdata stores ts as int64-nanos, generated corpora may store a real
    # timestamp — the stream must mirror whichever this corpus has
    if is_dir:
        probe = spark.read.parquet(path)
        stream = spark.readStream.schema(probe.schema).parquet(path)
    else:
        probe = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf)
        stream = (spark.readStream.schema(probe.schema)
                  .option("pathGlobFilter", "events.parquet").parquet(sf))
    ts_type = probe.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # micros-physical corpora read as NTZ; session zone is pinned UTC so
        # the cast to the session-zone TIMESTAMP is wall-clock-preserving
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _state_partitions_for(spark: SparkSession, sf: str) -> int:
    """Adaptive state-partition count: ~512 KB of source parquet per state
    partition, clamped to [4, cores]. Tiny gate corpora keep the cheap
    4-store setup; replicated scale corpora fan the state (and the Python
    stateful workers, which are row-bound — the parquet is ~10x
    compressed) back out. $SPARK_GRAFT_STREAM_PARTITIONS overrides."""
    import os

    path = f"{sf}/events.parquet"
    if os.path.isdir(path):
        size = sum(e.stat().st_size for e in os.scandir(path) if e.is_file())
    else:
        size = os.path.getsize(path)
    cores = spark.sparkContext.defaultParallelism
    return max(4, min(cores, size // (512 * 1024)))


def s01_stream_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window aggregation executed through Structured Streaming.

    The events parquet is consumed as a STREAM (availableNow trigger), the
    windowed aggregate runs through the streaming engine into a memory sink,
    and the sink's table is returned. The oracle is the batch answer —
    equality IS the exactly-once guarantee check.
    """
    from etl_docker_spark.streaming import tumbling_aggregate

    stream = _events_stream(spark, sf)
    agg = tumbling_aggregate(
        stream, "1 day",
        {"n_events": F.count("*"),
         "total_value": F.sum(F.col("value").cast("decimal(12,4)")).cast("double")},
        keys=["event_type"], watermark="1 minute")
    name = f"s01_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S01_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY date_trunc('day', ts), event_type
"""

# ---------------------------------------------------------------- d07 simhash


def d07_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash per document (portable md5 bit source, §dedup).

    Uses the codegen-friendly explode+aggregate path (simhash_table); the
    column-expression variant (simhash64) computes the same value but folds
    a 64-lane lambda per token — 10x slower on a corpus pass.
    """
    return _simhash_frame(spark, sf)


def _simhash_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-session memoized (doc_id, simhash) corpus fingerprint table —
    the md5-per-token pass is the whole cost of the simhash family, and
    d07 (table) + d11 (pairs) share one artifact, like any fingerprint
    store a dedup service keeps."""
    from etl_docker_spark.llm.index_cache import memo_frame

    def build() -> DataFrame:
        docs = t(spark, sf, "documents")
        # CPU fan-out, partitioned BY ID so simhash_table's groupBy(doc_id)
        # over the exploded tokens inherits the partitioning, no shuffle
        docs = docs.repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id"))
        return simhash_table(docs, "doc_id", "text")

    return memo_frame(spark, f"simhash_table:{sf}", build, sf_dir=sf)


D07_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h0,
         CAST('0x' || substring(md5(tok), 9, 8) AS BIGINT) AS h1
  FROM toks
),
lanes AS (
  SELECT doc_id, b.i AS i,
         SUM(CASE WHEN ((h0 >> b.i) & 1) = 1 THEN 1 ELSE -1 END) AS cnt0,
         SUM(CASE WHEN ((h1 >> b.i) & 1) = 1 THEN 1 ELSE -1 END) AS cnt1
  FROM h, (SELECT unnest(generate_series(0, 31)) AS i) b
  GROUP BY doc_id, b.i
),
bits AS (
  SELECT doc_id,
         CASE WHEN cnt0 > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END AS w0,
         CASE WHEN cnt1 > 0 THEN
           CASE WHEN i = 31 THEN CAST(-9223372036854775808 AS BIGINT)
                ELSE (CAST(1 AS BIGINT) << (i + 32)) END
         ELSE 0 END AS w1
  FROM lanes
)
SELECT doc_id, CAST(SUM(w0) + SUM(w1) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""

# ---------------------------------------------------------------- d11 simhash pairs


def d11_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash hamming-band near-dup pairs — the banding/verify stage on top
    of d07's fingerprints (completeness guarantee: 3 < 4 bands, pigeonhole;
    see llm.dedup.simhash_near_dup_pairs)."""
    from etl_docker_spark.llm.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(t(spark, sf, "documents"), "doc_id", "text",
                                  sig=_simhash_frame(spark, sf))


# the D07 fingerprint pipeline (same CTEs) + banding, candidates, verify
_D07_CTES, _ = D07_SQL.strip().removeprefix("WITH").rsplit(
    "SELECT doc_id, CAST(SUM(w0) + SUM(w1) AS BIGINT) AS simhash", 1)
D11_SQL = f"""
WITH {_D07_CTES}
, sigs AS (
  SELECT doc_id, CAST(SUM(w0) + SUM(w1) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.i AS band, (simhash >> (16 * b.i)) & 65535 AS k
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS i) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.k = y.k AND x.doc_id < y.doc_id
)
SELECT cand.doc_a, cand.doc_b,
       CAST(bit_count(xor(sa.simhash, sc.simhash)) AS BIGINT) AS hamming
FROM cand
JOIN sigs sa ON cand.doc_a = sa.doc_id
JOIN sigs sc ON cand.doc_b = sc.doc_id
WHERE bit_count(xor(sa.simhash, sc.simhash)) <= 3
"""

# ---------------------------------------------------------------- d12 multimodal


def d12_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing under the gate: documents become opaque binary
    payloads with typed metadata; feature extraction runs through the REAL
    distributed path (mapInPandas over Arrow batches, the hook where actual
    codecs plug in) and frame sampling through the column-algebra planner.
    Outputs are integer-exact (byte count, md5-derived checksum, frame
    count), so the DuckDB oracle verifies the Python decode path
    value-for-value.
    """
    from etl_docker_spark.llm.multimodal import extract_features, sample_frames

    docs = t(spark, sf, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("doc_id") % 5000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    feats = extract_features(media.select("media_id", "content"))
    frames = (sample_frames(media, every_ms=1000)
              .groupBy("media_id").agg(F.count("*").alias("n_frames")))
    return feats.drop("feature").join(frames, "media_id")


D12_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(('0x' || substring(md5(text), 1, 8))::VARCHAR AS BIGINT) AS checksum,
       CAST((doc_id % 5000) // 1000 + 1 AS BIGINT) AS n_frames
FROM documents
"""

# ---------------------------------------------------------------- q24 cube


def q24_cube_totals(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (free in Spark; absent in the reference).

    Same base-grain discipline as q34: the fact table collapses to the
    finest (returnflag, linestatus) grain first, and CUBE's Expand runs
    over single-digit rows instead of the fact table (decimal partials
    re-sum exactly, so results are bit-identical)."""
    from etl_docker_spark.plans._util import dec

    base = (t(spark, sf, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(dec("l_quantity")).alias("sq"),
                 F.count("*").alias("n")))
    return (base.cube("l_returnflag", "l_linestatus")
            .agg(F.sum("sq").cast("double").alias("sum_qty"),
                 F.sum("n").alias("n_lines")))


Q24_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# ---------------------------------------------------------------- q25 unpivot


def q25_unpivot_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (stack): wide metrics -> long (metric, value) rows."""
    return t(spark, sf, "customer").selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
        "AS (metric, value)",
    )


Q25_SQL = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
"""

# ---------------------------------------------------------------- e03 recall


def e03_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """ANN quality measurement: how many exact top-5 neighbors the IVF
    bucketing (same floor-grid as e02) retains per query — the recall side
    of the speed/recall trade, computed inside the engine."""
    from etl_docker_spark.llm.similarity import brute_force_knn, bucket_expr

    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_knn(emb, queries, k=5).select("query_id", "neighbor_id")

    bucketed = emb.select(
        F.col("vec_id"),
        bucket_expr(F.col("embedding"), 1).alias("b1"),
        bucket_expr(F.col("embedding"), 2).alias("b2"),
    )
    qb = (bucketed.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("query_id"), "b1", "b2"))
    cand = (qb.join(bucketed.withColumnRenamed("vec_id", "neighbor_id"), ["b1", "b2"])
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id"))
    hits = exact.join(cand, ["query_id", "neighbor_id"], "left_semi")
    return (exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
            .join(hits.groupBy("query_id").agg(F.count("*").alias("n_hits")),
                  "query_id", "left")
            .select("query_id", "n_exact",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits")))


E03_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_DOT.format(a='q.qv', b='e.embedding')}
           / sqrt({_DOT.format(a='q.qv', b='q.qv')} * {_DOT.format(a='e.embedding', b='e.embedding')}) AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) <= 5
),
b AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 4) AS BIGINT) AS b1,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 4) AS BIGINT) AS b2
  FROM embeddings
),
cand AS (
  SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
  FROM b qb JOIN b nb ON qb.b1 = nb.b1 AND qb.b2 = nb.b2 AND qb.vec_id <> nb.vec_id
  WHERE qb.vec_id < 8
)
SELECT e.query_id, COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
FROM exact e
LEFT JOIN cand c ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
GROUP BY e.query_id
"""

# ---------------------------------------------------------------- e04 multiprobe


def e04_multiprobe_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-probe IVF recall dial: exact top-5 hit counts when probing the
    query's own cell (p0) vs its 3x3 neighborhood (p1). Probe cells are
    ENUMERATED so candidate generation stays an equi-join at any probe
    radius (llm.similarity.probe_cells) — the scalable multi-probe shape.
    """
    from etl_docker_spark.llm.similarity import (
        brute_force_knn, bucket_expr, probe_cells)

    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_knn(emb, queries, k=5).select("query_id", "neighbor_id")

    bucketed = emb.select(
        F.col("vec_id"),
        bucket_expr(F.col("embedding"), 1).alias("b1"),
        bucket_expr(F.col("embedding"), 2).alias("b2"),
    )
    qb = (bucketed.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("query_id"), "b1", "b2"))
    q9 = (qb.select("query_id",
                    F.explode(probe_cells(F.col("b1"), F.col("b2"), 1)).alias("c"))
          .select("query_id", F.col("c.b1").alias("b1"), F.col("c.b2").alias("b2")))
    cand1 = (q9
             .join(bucketed.withColumnRenamed("vec_id", "neighbor_id"), ["b1", "b2"])
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id"))
    cand0 = (qb.join(bucketed.withColumnRenamed("vec_id", "neighbor_id"), ["b1", "b2"])
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id"))
    h0 = (exact.join(cand0, ["query_id", "neighbor_id"], "left_semi")
          .groupBy("query_id").agg(F.count("*").alias("n_hits_p0")))
    h1 = (exact.join(cand1, ["query_id", "neighbor_id"], "left_semi")
          .groupBy("query_id").agg(F.count("*").alias("n_hits_p1")))
    return (exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
            .join(h0, "query_id", "left").join(h1, "query_id", "left")
            .select("query_id", "n_exact",
                    F.coalesce("n_hits_p0", F.lit(0)).alias("n_hits_p0"),
                    F.coalesce("n_hits_p1", F.lit(0)).alias("n_hits_p1")))


E04_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_DOT.format(a='q.qv', b='e.embedding')}
           / sqrt({_DOT.format(a='q.qv', b='q.qv')} * {_DOT.format(a='e.embedding', b='e.embedding')}) AS cos_raw
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) <= 5
),
b AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 4) AS BIGINT) AS b1,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 4) AS BIGINT) AS b2
  FROM embeddings
),
offs AS (SELECT unnest([-1, 0, 1]) AS d1),
cand1 AS (
  SELECT DISTINCT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
  FROM b qb, offs o1, offs o2
  JOIN b nb ON qb.b1 + o1.d1 = nb.b1 AND qb.b2 + o2.d1 = nb.b2
  WHERE qb.vec_id < 8 AND qb.vec_id <> nb.vec_id
),
cand0 AS (
  SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
  FROM b qb JOIN b nb ON qb.b1 = nb.b1 AND qb.b2 = nb.b2 AND qb.vec_id <> nb.vec_id
  WHERE qb.vec_id < 8
)
SELECT e.query_id, COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN c0.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_p0,
       CAST(SUM(CASE WHEN c1.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_p1
FROM exact e
LEFT JOIN cand0 c0 ON e.query_id = c0.query_id AND e.neighbor_id = c0.neighbor_id
LEFT JOIN cand1 c1 ON e.query_id = c1.query_id AND e.neighbor_id = c1.neighbor_id
GROUP BY e.query_id
"""

# ---------------------------------------------------------------- s02 sessions


def s02_stream_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful session windows executed through Structured Streaming.

    `session_window(ts, 30 min)` per user; the oracle derives the same
    sessions with lag+cumsum (session_end here is last event + gap, per
    Spark's session_window semantics).
    """
    from etl_docker_spark.streaming import session_aggregate

    stream = _events_stream(spark, sf)
    agg = session_aggregate(
        stream, "30 minutes",
        {"n_events": F.count("*"),
         "total_value": F.sum(F.col("value").cast("decimal(12,4)")).cast("double")},
        keys=["user_id"], watermark="1 minute")
    name = f"s02_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S02_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sess
"""

# ---------------------------------------------------------------- d08 clusters


def d08_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    pair graph (min-label propagation + pointer jumping, run to a fixed
    point — `operators/graph.py`; it raises rather than returning
    fragmented components if the round cap is ever hit).

    Output: (doc_id, cluster_id) for every doc in at least one pair,
    cluster_id = min doc_id of its component.
    """
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.operators.graph import connected_components
    from etl_docker_spark.plans.llm_queries import minhash_pairs_frame

    def build() -> DataFrame:
        pairs = minhash_pairs_frame(spark, sf)
        labels = connected_components(pairs, src="doc_a", dst="doc_b")
        return labels.select(F.col("node").alias("doc_id"),
                             F.col("label").alias("cluster_id"))

    # memoized as a frame of its own: d14 consumes the cluster table, and
    # the label-propagation loop (driver-side iteration) shouldn't re-run
    # for it
    return memo_frame(spark, f"d08_clusters:{sf}", build, sf_dir=sf)


# the D06 pipeline (same CTEs) + recursive reachability for components
_D06_BODY = D06_SQL.strip().removeprefix("WITH").rsplit("SELECT doc_a, doc_b,", 1)[0]
D08_SQL = f"""
WITH RECURSIVE {_D06_BODY}
, pairs AS (
  SELECT doc_a, doc_b FROM ver WHERE 2 * inter_n >= total_n - inter_n
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.other = e.a
)
SELECT node AS doc_id, LEAST(node, MIN(other)) AS cluster_id
FROM reach GROUP BY node
"""

# ---------------------------------------------------------------- q26 windows


def q26_window_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Window-function battery (§2.6 extension): lag/lead/first/ntile over a
    total order — one shuffle on the partition key."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_total"),
        F.lead("o_totalprice").over(w).alias("next_total"),
        F.first("o_totalprice").over(w).alias("first_total"),
        F.ntile(4).over(w).alias("spend_quartile"),
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)).alias("order_seq"),
    )


Q26_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice)  OVER w AS prev_total,
       lead(o_totalprice) OVER w AS next_total,
       first_value(o_totalprice) OVER w AS first_total,
       CAST(ntile(4) OVER w AS INT) AS spend_quartile,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# ---------------------------------------------------------------- s03 stateful


def s03_stateful_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) under the gate.

    Per-user totals accumulated in the streaming STATE STORE over the whole
    events table; the surfaced columns are the integer-exact ones
    (event counts — float totals are dropped because pandas-side summation
    order is nondeterministic), so the batch GROUP BY is a full oracle:
    equality proves the state store saw every event exactly once.
    """
    from etl_docker_spark.streaming.stateful import running_user_totals

    stream = _events_stream(spark, sf)
    out = running_user_totals(stream.select("user_id", "ts", "value"))
    name = f"s03_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (out.writeStream.outputMode("update").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    # update-mode sink: keep the final state row per user
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (spark.table(name)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "n_events"))


# ---------------------------------------------------------------- s04 dedup


def s04_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming key-dedup through the state store (A4's streaming twin).

    Distinct (user_id, event_type, day) triples computed by streaming
    dropDuplicates; the oracle is batch SELECT DISTINCT — equality proves
    the dedup state saw every event and emitted each key exactly once.
    """
    from etl_docker_spark.streaming import streaming_dedup

    stream = _events_stream(spark, sf).withColumn(
        "day", F.date_trunc("day", F.col("ts")))
    out = streaming_dedup(stream, ["user_id", "event_type", "day"])
    name = f"s04_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (out.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S04_SQL = """
SELECT DISTINCT user_id, event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events
"""

ADVANCED = {
    "q23_asof_last_order": (q23_asof_last_order, Q23_SQL),
    "s01_stream_tumbling": (s01_stream_tumbling, S01_SQL),
    "d07_simhash": (d07_simhash, D07_SQL),
    "q24_cube_totals": (q24_cube_totals, Q24_SQL),
    "q25_unpivot_metrics": (q25_unpivot_metrics, Q25_SQL),
    "q26_window_battery": (q26_window_battery, Q26_SQL),
    "e03_ann_recall": (e03_ann_recall, E03_SQL),
    "s02_stream_sessions": (s02_stream_sessions, S02_SQL),
    "s03_stateful_running_totals": (
        s03_stateful_running_totals,
        "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id"),
    "s04_stream_dedup": (s04_stream_dedup, S04_SQL),
    "d08_dup_clusters": (d08_dup_clusters, D08_SQL),
    "d11_simhash_pairs": (d11_simhash_pairs, D11_SQL),
    "d12_multimodal_features": (d12_multimodal_features, D12_SQL),
    "e04_multiprobe_recall": (e04_multiprobe_recall, E04_SQL),
}
