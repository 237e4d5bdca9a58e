"""Round-10 registrations — written and oracle-verified in round 9
under the staging discipline (rounds 7->8->9->10: each round's new
queries are staged unregistered so the round's artifacts stay
self-consistent, then registered first thing the following round).
Registered into the gate window in round 10.

- d72 extends the fuzzy-dedup ladder (d70 substitution-1 exact, d71
  general ed<=2) to TOKEN-level transpositions — the entity-resolution
  shape char-level edit distance cannot reach ("ACME Corp Ltd" vs
  "Ltd ACME Corp" is char-distance ~8 but the same entity).
- s33 lifts q101's three-way malformed/json-null/value quarantine
  routing into the streaming landing path (the reference's error-
  isolation idiom CotyData_IPN.py:190,247 under continuous ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND11: dict = {}

# ---------------------------------------------------------------- d72

_D72_NTOK = 6
_D72_ALIAS_OFFSET = 10_000_000


def d72_token_transposition_dedup(spark: SparkSession,
                                  sf: str) -> DataFrame:
    """Word-order-insensitive duplicate detection via SORTED-TOKEN
    signature blocking: two keys are transposition-duplicates iff their
    token MULTISETS are equal, and the sorted-token string is a perfect
    (exact, collision-free) signature for multiset equality — so unlike
    d71's recall-only depth-2 blocking, no verify join is needed at all.
    Deterministic rotated aliases (rotate the first-6-token key by
    1 + doc_id%3 positions) are injected for every 5th document; both
    engines rebuild the identical corpus.

    The whole answer is THREE HASH AGGREGATES, zero joins:
      1. (sig, raw) -> multiplicity m        [same-string collapse]
      2. sig        -> n, C(n,2)-sum C(m,2)  [cross-ordering pair count]
      3. (sig, source_id) -> role count      [injected-pair recovery]
    Pure aggregation is the 100-TB shape: one shuffle per level, no
    candidate blowup possible, block skew irrelevant because nothing is
    ever paired row-by-row — pair COUNTS fall out of the group sizes.
    """
    docs = t(spark, sf, "documents")
    base = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        F.expr(f"slice(split(text, ' '), 1, {_D72_NTOK})").alias("tok"))
    rot = f"1 + pmod(id, 3)"
    aliases = (base.filter(F.expr("id % 5 = 0"))
               .select((F.col("id") + F.lit(_D72_ALIAS_OFFSET))
                       .alias("id"),
                       F.expr(f"concat(slice(tok, ({rot}) + 1, "
                              f"{_D72_NTOK}), slice(tok, 1, {rot}))")
                       .alias("tok")))
    corpus = (base.unionByName(aliases)
              .select("id",
                      F.array_join(F.col("tok"), " ").alias("raw"),
                      F.array_join(F.sort_array(F.col("tok")), " ")
                      .alias("sig")))
    per_raw = (corpus.groupBy("sig", "raw")
               .agg(F.count("*").alias("m")))
    per_sig = (per_raw.groupBy("sig")
               .agg(F.sum("m").alias("n"),
                    F.sum(F.expr("m * (m - 1) div 2")).alias("same_pairs")))
    pair_stats = per_sig.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long")
        .alias("n_multi_groups"),
        F.sum(F.expr("n * (n - 1) div 2 - same_pairs")).cast("long")
        .alias("n_reorder_pairs"))
    injected = (corpus
                .select(F.expr(f"CASE WHEN id >= {_D72_ALIAS_OFFSET} "
                               f"THEN id - {_D72_ALIAS_OFFSET} "
                               f"ELSE id END").alias("src"),
                        F.expr(f"id >= {_D72_ALIAS_OFFSET}")
                        .alias("is_alias"), "sig")
                .groupBy("sig", "src")
                .agg(F.count_distinct("is_alias").alias("roles"))
                .agg(F.sum(F.when(F.col("roles") == 2, 1).otherwise(0))
                     .cast("long").alias("n_injected_found")))
    return pair_stats.crossJoin(injected)  # two 1-row frames


D72_SQL = f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         string_split(text, ' ')[1:{_D72_NTOK}] AS tok
  FROM documents
),
aliases AS (
  -- rotation amount r is computed in the inner scope from the TRUE id
  -- as belt-and-braces against engine alias-resolution differences:
  -- DuckDB actually gives the BASE column precedence over a same-named
  -- lateral alias (`SELECT id+10 AS id, id % 3` uses the base id), so
  -- the flat form would also be correct — but the inner scope makes the
  -- binding explicit instead of relying on precedence rules.
  SELECT id + {_D72_ALIAS_OFFSET} AS id,
         tok[r + 1:] || tok[1:r] AS tok
  FROM (SELECT id, tok, 1 + id % 3 AS r FROM base WHERE id % 5 = 0)
),
corpus AS (
  SELECT id, array_to_string(tok, ' ') AS raw,
         array_to_string(list_sort(tok), ' ') AS sig
  FROM (SELECT id, tok FROM base UNION ALL
        SELECT id, tok FROM aliases)
),
per_raw AS (
  SELECT sig, raw, COUNT(*) AS m FROM corpus GROUP BY sig, raw
),
per_sig AS (
  SELECT sig, SUM(m) AS n, SUM(m * (m - 1) // 2) AS same_pairs
  FROM per_raw GROUP BY sig
),
pair_stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_groups,
         CAST(SUM(n * (n - 1) // 2 - same_pairs) AS BIGINT)
           AS n_reorder_pairs
  FROM per_sig
),
injected AS (
  SELECT CAST(SUM(CASE WHEN roles = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_injected_found
  FROM (SELECT sig,
               CASE WHEN id >= {_D72_ALIAS_OFFSET}
                    THEN id - {_D72_ALIAS_OFFSET} ELSE id END AS src,
               COUNT(DISTINCT id >= {_D72_ALIAS_OFFSET}) AS roles
        FROM corpus GROUP BY 1, 2)
)
SELECT * FROM pair_stats, injected
"""

ROUND11.update({
    "d72_token_transposition_dedup": (d72_token_transposition_dedup,
                                      D72_SQL),
})

# ---------------------------------------------------------------- s33


def s33_stream_json_quarantine(spark: SparkSession, sf: str) -> DataFrame:
    """q101's malformed/json-null/value quarantine routing INSIDE the
    streaming landing path: the same deterministic corruption feeds a
    `try_parse_json` + `is_variant_null` verdict expression in the
    stream's select, and the routing rolls up into event-time day
    windows per verdict — bad payloads are counted and quarantined
    continuously, never thrown (ANSI parse_json would kill the stream
    on the first bad batch; this is the streaming form of the
    reference's error-isolation idiom, CotyData_IPN.py:190,247).

    $.k uses the same regex-gated string extraction as q101 so the
    cross-engine coercion is structural on both sides.

    Scale shape: verdict + extraction are per-row codegen expressions
    in the reader's select (no second pass, no UDF); state is
    (days x verdicts) windowed groups behind a watermark — s31's exact
    state bound with the quarantine verdict as the extra key.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    stream = _events_stream(spark, sf)
    fed = stream.select(
        "ts",
        F.expr("CASE WHEN event_id % 7 = 0 "
               "THEN substring(props, 1, greatest(length(props) - 2, 1)) "
               "WHEN event_id % 7 = 1 THEN 'null' "
               "ELSE props END").alias("payload"))
    parsed = fed.select(
        "ts", F.expr("try_parse_json(payload)").alias("v"))
    k_str = "try_variant_get(v, '$.k', 'string')"
    routed = parsed.select(
        "ts",
        F.when(F.col("v").isNull(), "malformed")
        .when(F.expr("is_variant_null(v)"), "json_null")
        .otherwise("value").alias("verdict"),
        F.expr(f"CASE WHEN {k_str} RLIKE '^-?[0-9]{{1,18}}$' "
               f"THEN CAST({k_str} AS BIGINT) END").alias("k"))
    agg = (routed.withWatermark("ts", "1 minute")
           .groupBy(F.window("ts", "1 day").alias("w"), "verdict")
           .agg(F.count("*").cast("long").alias("n_rows"),
                F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("long")
                .alias("sum_k"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "verdict", "n_rows", "sum_k"))
    name = f"s33_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S33_SQL = """
WITH fed AS (
  SELECT ts,
         CASE WHEN event_id % 7 = 0
              THEN substring(props, 1, greatest(length(props) - 2, 1))
              WHEN event_id % 7 = 1 THEN 'null'
              ELSE props END AS payload
  FROM events
),
v AS (
  SELECT ts,
         CASE WHEN payload IS NULL OR NOT json_valid(payload)
                THEN 'malformed'
              WHEN json_type(CAST(payload AS JSON)) = 'NULL'
                THEN 'json_null'
              ELSE 'value' END AS verdict,
         CASE WHEN payload IS NOT NULL AND json_valid(payload)
                   AND json_type(CAST(payload AS JSON)) != 'NULL'
                   AND regexp_matches(
                         json_extract_string(payload, '$.k'),
                         '^-?[0-9]{1,18}$')
              THEN CAST(json_extract_string(payload, '$.k') AS BIGINT)
              ELSE NULL END AS k
  FROM fed
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
         AS window_end,
       verdict,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
FROM v
GROUP BY 1, 2, 3
"""

ROUND11.update({
    "s33_stream_json_quarantine": (s33_stream_json_quarantine, S33_SQL),
})
