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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND6B: dict = {}

# ---------------------------------------------------------------- d57

_D57_GROUP = 5        # docs per shared-prefix group
_D57_GTOKS = 29       # tokens in the group-shared block
_D57_TRIPLES = 60     # pool triples drawn per doc
_D57_POOL_X = 4       # pool size = 4x corpus size (keeps dfreq ~15 at any N)
_D57_CLONE_MOD = 50   # doc_id % 50 == 1 -> clone of doc_id - 1
_D57_K = 256          # suffix histogram buckets — sized to ~set size (see
                      # docstring: K >= |set| is what makes the bound bite)


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


def d57_adversarial_frame(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, text) with the adversarial construction — shared by the
    gate query and the SCALE.md stage-count stress harness."""
    docs = t(spark, sf, "documents").select("doc_id")
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

    adv = d57_adversarial_frame(spark, sf).localCheckpoint()
    return prefix_filter_jaccard_pairs(
        adv, "doc_id", "text", shingle_n=3, t_num=1, t_den=2,
        positional=True, suffix_buckets=_D57_K)


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
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_D57_CLONE_MOD} = 1 THEN doc_id - 1
              ELSE doc_id END AS eid,
         doc_id // {_D57_GROUP} AS gid,
         (SELECT {_D57_POOL_X} * COUNT(*) FROM documents) AS pool
  FROM documents
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
