"""Round-13 STAGED queries — written and oracle-verified in round 11,
deliberately NOT yet imported by the registry (the staging discipline
of rounds 7->11: this round's artifacts are regenerated at the
246-query surface; the next round registers this module first thing,
then regenerates everything at 248).

- d76 completes the fuzzy-dedup ladder's ENTITY step: d75's verified
  pair frame (transposition + single-token typo matches) is only a
  RELATION, and a non-transitive one — "ACME Corp Ltd" ~ "ACNE Corp
  Ltd" ~ "ACNE Corp Ltd-typo2" chains; dedup at 100 TB keeps ONE
  survivor per connected component, not per pair. d76 composes the
  d75 blocking with connected_components_two_phase (Kiveris SoCC'14
  large-star/small-star, the O(log^2 n)-round CC already gated by
  g06) and emits the entity-level survivor statistics. The oracle
  extends d75's independent all-pairs brute force with a RECURSIVE
  transitive closure — ground-truth components, no blocking replay.
- s34 lifts d74's heavy-hitter lifecycle into STREAMING: per
  event-time day, the top-k heavy user-hash buckets via approx_top_k
  as the streaming aggregate state — fixed-size state per window that
  merges across micro-batches, where an exact streaming top-k would
  carry a per-key count map (state grows with cardinality). Gate
  exactness: maxItemsTracked >= the bounded bucket domain keeps the
  sketch exact, and d66's boundary-stratum drop makes the emitted SET
  tie-order independent, so plain exact counts reproduce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans.round11b import (_D75_ORACLE_CTES,
                                             _d75_corpus,
                                             _d75_verified_pairs)

ROUND13: dict = {}

# ---------------------------------------------------------------- d76


def d76_entity_grouping(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy-duplicate ENTITY RESOLUTION end-to-end: d75's exact-
    recall/exact-precision pair frame -> large-star/small-star
    connected components -> per-entity survivor stats (survivor = the
    component-minimum id, which IS the CC label). Emits the numbers a
    dedup job actually acts on: how many distinct duplicated entities,
    how many member rows they span, the largest cluster, and how many
    rows a keep-one-survivor pass would remove.

    Scale shape: the pair frame is linear in true-duplicate volume
    (d75's blocking argument), CC shuffles are bounded by |E| per
    round with O(log^2 n) rounds (g06's argument), and the stats are
    one aggregate over |components| rows. The final crossJoin is
    1-row x 1-row stats assembly. The ORACLE never sees the blocking
    OR the CC algorithm: brute-force all-pairs scoring plus a
    recursive-CTE transitive closure, both independent formulations.
    """
    from etl_docker_spark.operators.graph import (
        connected_components_two_phase)

    corpus = _d75_corpus(spark, sf)
    pairs = _d75_verified_pairs(corpus).select("id_a", "id_b")
    labels = connected_components_two_phase(pairs, src="id_a",
                                            dst="id_b")
    per_cluster = labels.groupBy("label").agg(
        F.count("*").alias("sz"))
    stats = per_cluster.agg(
        F.count("*").cast("long").alias("n_entities_with_dups"),
        F.sum("sz").cast("long").alias("n_dup_members"),
        F.max("sz").cast("long").alias("max_cluster_size"),
        F.sum(F.expr("sz - 1")).cast("long").alias("n_removable"),
        F.sum(F.expr("label % 1000000")).cast("long")
        .alias("survivor_checksum"))
    counts = corpus.agg(F.count("*").cast("long").alias("n_names"))
    return counts.crossJoin(stats)  # two 1-row frames


D76_SQL = f"""
WITH RECURSIVE {_D75_ORACLE_CTES},
edges AS (
  SELECT id_a AS a, id_b AS b FROM matched
  UNION ALL SELECT id_b, id_a FROM matched
),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.other = e.a
),
lab AS (
  SELECT node, LEAST(node, MIN(other)) AS label
  FROM reach GROUP BY node
),
clus AS (
  SELECT label, COUNT(*) AS sz FROM lab GROUP BY label
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_names,
       CAST(COUNT(*) AS BIGINT) AS n_entities_with_dups,
       CAST(SUM(sz) AS BIGINT) AS n_dup_members,
       CAST(MAX(sz) AS BIGINT) AS max_cluster_size,
       CAST(SUM(sz - 1) AS BIGINT) AS n_removable,
       CAST(SUM(label % 1000000) AS BIGINT) AS survivor_checksum
FROM clus
"""

ROUND13.update({
    "d76_entity_grouping": (d76_entity_grouping, D76_SQL),
})

# ---------------------------------------------------------------- s34

_S34_DOMAIN = 64
_S34_K = 8
_S34_TRACK = 256  # >= domain -> the sketch is EXACT (d74 regime)


def s34_stream_topk_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING heavy-hitter lifecycle — d74's approx_top_k family as
    the streaming aggregate state: per event-time day, the top-k heavy
    user-hash buckets. The sketch state is fixed-size per window and
    merges associatively across micro-batches and shuffle partitions
    (the same state-merge discipline as s32's HLL); an exact streaming
    top-k would carry a full per-key count map in the state store.
    Post-aggregation shaping (boundary-stratum drop + explode) runs
    BATCH-side over the memory sink, keeping the streaming plan a pure
    windowed aggregate. Gate exactness: maxItemsTracked >= the bounded
    64-bucket domain keeps every sketch in its exact phase, and
    dropping the k-th-count stratum (d66's dodge) makes the emitted
    set tie-order independent — the oracle reproduces it from plain
    exact counts.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    stream = _events_stream(spark, sf)
    bucket = F.expr(
        f"pmod(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
        f"16, 10) AS BIGINT), {_S34_DOMAIN})")
    agg = (stream.select("ts", bucket.alias("b"))
           .withWatermark("ts", "1 minute")
           .groupBy(F.window("ts", "1 day").alias("w"))
           .agg(F.count("*").cast("long").alias("n_events"),
                F.expr(f"approx_top_k(b, {_S34_K}, {_S34_TRACK})")
                .alias("tk"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "n_events", "tk"))
    name = f"s34_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    landed = spark.table(name)
    bounded = landed.select(
        "window_start", "window_end", "n_events",
        F.expr("array_min(transform(tk, x -> x.count))").alias("min_cnt"),
        F.explode("tk").alias("e"))
    return (bounded.filter(F.col("e.count") > F.col("min_cnt"))
            .select("window_start", "window_end", "n_events",
                    F.col("e.item").cast("long").alias("bucket"),
                    F.col("e.count").cast("long").alias("cnt"))
            .orderBy("window_start", "bucket"))


S34_SQL = f"""
WITH tb AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              ::BIGINT % {_S34_DOMAIN} AS BIGINT) AS b
  FROM events
),
cnt AS (
  SELECT ws, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tb GROUP BY ws, b
),
totals AS (
  SELECT ws, CAST(SUM(cnt) AS BIGINT) AS n_events FROM cnt GROUP BY ws
),
topk AS (
  SELECT ws, b, cnt,
         row_number() OVER (PARTITION BY ws ORDER BY cnt DESC, b ASC)
           AS rn
  FROM cnt
),
kth AS (
  SELECT ws, MIN(cnt) AS min_cnt FROM topk
  WHERE rn <= {_S34_K} GROUP BY ws
)
SELECT t.ws AS window_start, t.ws + INTERVAL 1 DAY AS window_end,
       tot.n_events, t.b AS bucket, t.cnt
FROM topk t
JOIN kth k ON k.ws = t.ws
JOIN totals tot ON tot.ws = t.ws
WHERE t.rn <= {_S34_K} AND t.cnt > k.min_cnt
ORDER BY window_start, bucket
"""

ROUND13.update({
    "s34_stream_topk_lifecycle": (s34_stream_topk_lifecycle, S34_SQL),
})
