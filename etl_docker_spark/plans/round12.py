"""Round-12 STAGED queries — written and oracle-verified in round 10,
deliberately NOT yet imported by the registry (the staging discipline
of rounds 7->10: the round-10 artifacts are regenerated at the
242-query surface; the next round registers this module first thing,
then regenerates everything at 244).

- d74 extends d66's heavy-hitter family to the full sketch-state
  LIFECYCLE: per-shard approx_top_k_accumulate states, cross-shard
  approx_top_k_combine, then estimate — the 1000-executor shape where
  no shard ever sees another shard's rows and only fixed-size states
  cross the wire (the same state-merge discipline as d64's theta and
  d67's HLL sketches, now for the top-k family).
- g09 extends g08's recursion to ACCUMULATION along paths: every node
  walks to its forest root accumulating edge costs — depth is
  data-dependent (no literal bound in the recursive term; the cur > 0
  guard terminates), which g08's fixed-depth form never exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import session_conf, t

ROUND12: dict = {}

# ---------------------------------------------------------------- d74

_D74_DOMAIN = 64          # token-hash bucket domain
_D74_K = 12
_D74_TRACK = 256          # >= domain -> the sketch is EXACT (d66 regime)

_D74_BUCKET_SPARK = (f"pmod(CAST(conv(substring(md5(tok), 1, 8), 16, 10) "
                     f"AS BIGINT), {_D74_DOMAIN})")
_D74_BUCKET_DUCK = (f"CAST(('0x' || substring(md5(tok), 1, 8))::BIGINT "
                    f"% {_D74_DOMAIN} AS BIGINT)")


def d74_topk_state_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed heavy-hitter lifecycle: accumulate an approx_top_k
    STATE per source shard, COMBINE the states, estimate the global
    top-k — then d66's structural tie dodge (drop the boundary stratum)
    so the published set is tie-order-independent and the oracle can
    reproduce it from plain exact counts. maxItemsTracked >= the
    bounded bucket domain makes the whole lifecycle exact, so the gate
    pins the accumulate->combine->estimate algebra itself (one wrong
    merge and counts drift).

    Scale shape: per-shard states are fixed-size; only |sources|
    states cross the wire; the estimate explodes <= K rows. This is
    the blocklist/stop-token build at 100 TB: no global per-token
    count ever materializes.
    """
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok"))
    shard_states = (toks
                    .select("source",
                            F.expr(_D74_BUCKET_SPARK).alias("b"))
                    .groupBy("source")
                    .agg(F.expr(f"approx_top_k_accumulate(b, "
                                f"{_D74_TRACK})").alias("st")))
    combined = shard_states.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.expr(f"approx_top_k_estimate(approx_top_k_combine(st, "
               f"{_D74_TRACK}), {_D74_K})").alias("tk"))
    bounded = combined.select(
        "n_shards",
        F.expr("array_min(transform(tk, x -> x.count))").alias("min_cnt"),
        F.explode("tk").alias("e"))
    return (bounded.filter(F.col("e.count") > F.col("min_cnt"))
            .select("n_shards",
                    F.col("e.item").cast("long").alias("bucket"),
                    F.col("e.count").cast("long").alias("cnt"))
            .orderBy("bucket"))


D74_SQL = f"""
WITH tb AS (
  SELECT {_D74_BUCKET_DUCK} AS b
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
),
cnt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM tb GROUP BY b
),
topk AS (
  SELECT b, cnt, row_number() OVER (ORDER BY cnt DESC, b ASC) AS rn
  FROM cnt
),
kth AS (
  SELECT MIN(cnt) AS min_cnt FROM topk WHERE rn <= {_D74_K}
),
shards AS (
  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_shards
  FROM documents
)
SELECT s.n_shards, t.b AS bucket, t.cnt
FROM topk t, kth k, shards s
WHERE t.rn <= {_D74_K} AND t.cnt > k.min_cnt
ORDER BY bucket
"""

ROUND12.update({
    "d74_topk_state_lifecycle": (d74_topk_state_lifecycle, D74_SQL),
})

# ---------------------------------------------------------------- g09

# forest: parent(v) = v div 2 (v > 0; 0 is the root), edge cost
# v % 10 + 1 — depth is data-dependent (~log2 of the key domain), so
# the Spark side recursion carries NO literal depth bound: termination
# comes from the cur > 0 guard alone.
_G09_SPARK = """
WITH RECURSIVE walk(node, cur, acc, depth) AS (
  SELECT CAST(c_custkey AS BIGINT) AS node,
         CAST(c_custkey AS BIGINT) AS cur,
         CAST(0 AS BIGINT) AS acc, 0 AS depth
  FROM {CUST}
  UNION ALL
  SELECT node, cur div 2 AS cur, acc + cur % 10 + 1 AS acc,
         depth + 1 AS depth
  FROM walk WHERE cur > 0
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(acc) AS BIGINT) AS sum_cost,
       CAST(MAX(acc) AS BIGINT) AS max_cost
FROM walk GROUP BY depth
"""

# the oracle only ever runs at the sf0.01/sf0.001 gate scale, where the
# key domain is <= 15,000 -> walk depth <= 14; unroll 20 levels with the
# same cur > 0 guard (levels past the deepest walk contribute 0 rows)
_G09_UNROLL = 20


def g09_recursive_path_cost(spark: SparkSession, sf: str) -> DataFrame:
    """Root-walk cost accumulation over a binary forest via
    WITH RECURSIVE — the accumulating, data-dependent-depth recursion
    shape (g08 is fixed-depth, non-accumulating). Every customer walks
    parent(v) = v div 2 to the root accumulating deterministic edge
    costs; output is per-depth frontier size and cost mass. The ORACLE
    unrolls the same walk into explicit guarded join levels — no
    WITH RECURSIVE — so the recursive executor's termination and
    accumulator handling are both gated against a non-recursive
    formulation.

    Scale shape: the frontier SHRINKS as walks terminate (cur = 0),
    each step is key-local arithmetic with no join at all — the
    recursion never touches a second table; state is O(live walks).
    """
    name = f"g09_cust_{abs(hash(sf)) % 10 ** 8}"
    t(spark, sf, "customer").createOrReplaceTempView(name)
    # The walk accumulates |customers| x depth rows and depth is
    # log2(max key): replica corpora carry keys ~10^9 (depth ~31), so
    # ~sf1 trips the 1M-row default recursion backstop. Same
    # session-level raise and rationale as q87 (round5.py) — the limit
    # is a runaway-recursion guard and 50M preserves that role.
    session_conf(spark, "spark.sql.cteRecursionRowLimit",
                 str(50_000_000))
    return spark.sql(_G09_SPARK.replace("{CUST}", name))


def _g09_unrolled_oracle() -> str:
    lvls = ["SELECT CAST(c_custkey AS BIGINT) AS node, "
            "CAST(c_custkey AS BIGINT) AS cur, "
            "CAST(0 AS BIGINT) AS acc, 0 AS depth FROM customer"]
    for d in range(1, _G09_UNROLL + 1):
        lvls.append(
            f"SELECT node, cur // 2 AS cur, acc + cur % 10 + 1 AS acc, "
            f"{d} AS depth FROM lvl{d - 1} WHERE cur > 0")
    ctes = [f"lvl{d} AS ({q})" for d, q in enumerate(lvls)]
    union = " UNION ALL ".join(
        f"SELECT * FROM lvl{d}" for d in range(_G09_UNROLL + 1))
    return (
        "WITH " + ", ".join(ctes) + ", walk AS (" + union + ") "
        "SELECT CAST(depth AS BIGINT) AS depth, "
        "CAST(COUNT(*) AS BIGINT) AS n_nodes, "
        "CAST(SUM(acc) AS BIGINT) AS sum_cost, "
        "CAST(MAX(acc) AS BIGINT) AS max_cost "
        "FROM walk GROUP BY depth")


G09_SQL = _g09_unrolled_oracle()

ROUND12.update({
    "g09_recursive_path_cost": (g09_recursive_path_cost, G09_SQL),
})
