"""Round-10 queries — written and oracle-verified in the round-8
continuation session, REGISTERED first thing in round 9 (the staging
discipline of rounds 7->8->9: stage late-session queries, register them
at the top of the next round, then regenerate every artifact at the new
surface count).

Probe findings these build on (pinned in tests/test_round9.py's
round-10 primitive tests):
- `levenshtein` is live on BOTH engines but Spark counts CODEPOINTS
  while DuckDB counts BYTES ('café'->'cafe' is 1 vs 2), so cross-engine
  parity requires ASCII inputs — d70 sanitizes its keys with a
  regexp_replace on BOTH sides, making parity structural rather than
  corpus luck (the ADVICE-r7 lesson).
- `soundex` is Spark-only (no DuckDB twin) — deliberately NOT staged;
  a gated query would be rows-only forever.
- `try_parse_json` returns NULL on malformed input (vs parse_json's
  throw) and `is_variant_null` distinguishes a parsed JSON null from
  SQL NULL — together they give the three-way landing verdict
  (malformed / JSON-null / value) that q101 gates; DuckDB mirrors via
  json_valid + literal-null detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND10: dict = {}

# ---------------------------------------------------------------- d70

# Distance bound: single-substitution typos. FastSS-style deletion
# neighborhoods (Bocek et al., "Fast Similarity Search in Large
# Dictionaries", 2007 — public) make the blocking EXACT for this bound
# on equal-length unique keys: two keys at substitution distance 1
# agree everywhere except one position p, so they collide on the
# (p, key-with-p-deleted) signature and on no other — candidate set ==
# answer set, precision 1.0, no quadratic block anywhere. (Naive
# substring blocking degenerates here: customer names share a constant
# 'Customer#000...' prefix, so any contiguous block key puts most of
# the table in one block.)
_D70_MAXDIST = 1


def d70_edit_distance_blocking(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy duplicate detection via edit distance under DELETION-
    NEIGHBORHOOD blocking — the record-linkage tier of the dedup family
    (exact d03, MinHash d06, SimHash d07, substring d50, PPJoin+
    d47/d53: none catch single-character typos in short fixed-format
    keys; levenshtein does, but only a blocking scheme keeps it
    sub-quadratic). Customer names are the fixed-format key: the pairs
    within substitution distance 1 are exactly the names differing in
    one digit.

    Each key explodes into L = len(key) signatures (position p, key
    with position p deleted); pairs joining on an identical signature
    are EXACTLY the distance-1 substitution pairs (see _D70_MAXDIST
    comment), and the levenshtein verify pins every candidate at
    distance 1 — max_dist == min_dist == 1 in the output is the
    precision-1.0 evidence, n_cand == n_pairs the recall side, both
    gated. Keys are ASCII-sanitized on both engines because Spark's
    levenshtein counts codepoints while DuckDB's counts bytes.

    Scale shape: linear L-times row expansion, one equi-join on the
    signature (shuffle join, tiny blocks — a signature collides only
    for true near-pairs plus the <= 10-way digit fan), per-candidate
    levenshtein. This is the 10^9-key production layout: output-bound
    candidate generation, verify cost proportional to matches, not to
    pairs of records.
    """
    cust = t(spark, sf, "customer")
    # length(key) > 0 guard: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0] (step defaults to -1) while DuckDB's generate_series(1, 0)
    # is empty — a key sanitized to '' would diverge (review finding)
    keys = cust.select(
        F.col("c_custkey").alias("id"),
        F.regexp_replace(F.col("c_name"), "[^\\x20-\\x7E]", "")
        .alias("key")).filter(F.length("key") > 0)
    sigs = (keys.select(
        "id", "key",
        F.explode(F.expr("sequence(1, length(key))")).alias("pos"))
        .select("id", "key", "pos",
                F.expr("concat(substring(key, 1, pos - 1), "
                       "substring(key, pos + 1))").alias("sig")))
    a = sigs.select(F.col("id").alias("id_a"), F.col("key").alias("key_a"),
                    "pos", "sig")
    b = sigs.select(F.col("id").alias("id_b"), F.col("key").alias("key_b"),
                    "pos", "sig")
    cand = (a.join(b, ["pos", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.levenshtein("key_a", "key_b").alias("dist")))
    return (cand.agg(
        F.count("*").cast("long").alias("n_cand"),
        F.sum(F.when(F.col("dist") <= _D70_MAXDIST, 1).otherwise(0))
        .cast("long").alias("n_pairs"),
        F.min("dist").cast("long").alias("min_dist"),
        F.max("dist").cast("long").alias("max_dist"),
        F.count_distinct(F.col("id_a")).cast("long")
        .alias("n_left_touched")))


D70_SQL = f"""
WITH keys AS (
  SELECT c_custkey AS id,
         regexp_replace(c_name, '[^\\x20-\\x7E]', '', 'g') AS key
  FROM customer
  WHERE length(regexp_replace(c_name, '[^\\x20-\\x7E]', '', 'g')) > 0
),
sigs AS (
  SELECT id, key, pos,
         concat(substring(key, 1, pos - 1), substring(key, pos + 1))
           AS sig
  FROM (SELECT id, key,
               unnest(generate_series(1, length(key))) AS pos
        FROM keys)
),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b,
         levenshtein(a.key, b.key) AS dist
  FROM sigs a JOIN sigs b ON a.pos = b.pos AND a.sig = b.sig
  WHERE a.id < b.id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       CAST(SUM(CASE WHEN dist <= {_D70_MAXDIST} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pairs,
       CAST(MIN(dist) AS BIGINT) AS min_dist,
       CAST(MAX(dist) AS BIGINT) AS max_dist,
       CAST(COUNT(DISTINCT id_a) AS BIGINT) AS n_left_touched
FROM cand
"""

ROUND10.update({
    "d70_edit_distance_blocking": (d70_edit_distance_blocking, D70_SQL),
})

# --------------------------------------------------------------- q101


def q101_try_parse_json_quarantine(spark: SparkSession,
                                   sf: str) -> DataFrame:
    """Malformed-payload quarantine routing via `try_parse_json` +
    `is_variant_null` (both live, neither previously queried): a
    deterministic in-query corruption fans the real events.props feed
    into three landing outcomes — MALFORMED (event_id % 7 = 0: payload
    truncated mid-object, try_parse_json -> SQL NULL), JSON-NULL
    (event_id % 7 = 1: payload replaced by the literal 'null', which
    PARSES into a variant null — is_variant_null distinguishes it from
    the malformed case), and VALUE (typed $.k extraction). This is
    K7's quarantine semantics lifted to the semi-structured landing
    path: bad rows are counted and routed, never thrown (ANSI-mode
    parse_json would abort the batch on the first bad payload).

    $.k coercion is STRUCTURAL, not corpus luck (ADVICE r8): both
    engines extract $.k as a STRING and apply the identical regex-gated
    integer cast. The engines' native numeric coercions genuinely
    diverge three ways (probed live: Spark
    try_variant_get(...,'bigint') casts true->1 and 12.5->12; Spark
    try_cast('12.5' as bigint) -> NULL; DuckDB TRY_CAST('12.5' AS
    BIGINT) ROUNDS to 13), so no native path can agree — the shared
    '^-?[0-9]{1,18}$' gate (length-capped so CAST can never overflow
    and throw on either engine) makes a future corpus change safe.

    Scale shape: one scan; the verdict is a per-row codegen CASE over
    try_parse_json — no second pass, no UDF; the rollup is an ordinary
    per-type hash aggregate.
    """
    ev = t(spark, sf, "events")
    fed = ev.select(
        "event_type",
        F.expr("CASE WHEN event_id % 7 = 0 "
               "THEN substring(props, 1, greatest(length(props) - 2, 1)) "
               "WHEN event_id % 7 = 1 THEN 'null' "
               "ELSE props END").alias("payload"))
    parsed = fed.select(
        "event_type", F.expr("try_parse_json(payload)").alias("v"))
    verdict = (F.when(F.col("v").isNull(), "malformed")
               .when(F.expr("is_variant_null(v)"), "json_null")
               .otherwise("value"))
    k_str = "try_variant_get(v, '$.k', 'string')"
    return (parsed.select("event_type", verdict.alias("verdict"),
                          F.expr(f"CASE WHEN {k_str} RLIKE "
                                 f"'^-?[0-9]{{1,18}}$' THEN "
                                 f"CAST({k_str} AS BIGINT) END")
                          .alias("k"))
            .groupBy("event_type", "verdict")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("long")
                 .alias("sum_k"))
            .orderBy("event_type", "verdict"))


Q101_SQL = """
WITH fed AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0
              THEN substring(props, 1, greatest(length(props) - 2, 1))
              WHEN event_id % 7 = 1 THEN 'null'
              ELSE props END AS payload
  FROM events
),
v AS (
  -- NULL payload and whitespace-wrapped 'null' are classified
  -- SEMANTICALLY (json_type), mirroring Spark's try_parse_json +
  -- is_variant_null exactly: NULL/invalid -> malformed, JSON null ->
  -- json_null. $.k: string extraction + the SAME regex-gated integer
  -- cast the Spark side applies (ADVICE r8 — the engines' native
  -- numeric coercions diverge on 'true'/'12.5', so neither is used)
  SELECT event_type,
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
SELECT event_type, verdict,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
FROM v
GROUP BY event_type, verdict
ORDER BY event_type, verdict
"""

ROUND10.update({
    "q101_try_parse_json_quarantine": (q101_try_parse_json_quarantine,
                                       Q101_SQL),
})
