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


def d47_prefix_filter_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.5 dedup pairs via prefix filtering
    (AllPairs/PPJoin candidates) — the ground-truth twin of d06's
    MinHash-LSH pairs: same (doc_a, doc_b, inter_n, union_n) contract,
    but complete by construction (the oracle is the brute-force
    all-pairs join; the engine never materializes all pairs — see
    `llm/dedup.py:prefix_filter_jaccard_pairs` for the shuffle ledger
    and the rarest-token-prefix argument that keeps it subquadratic)."""
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3)


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
