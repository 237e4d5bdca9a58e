"""Round-9 registrations beyond the staged round-10 pair: the general
edit-distance-<=2 tier of fuzzy dedup (VERDICT r8 item 6) and the seeded
synthetic-data generator battery (item 7 — `uniform()`/`randstr()` were
probe-live but never queried).

Cross-engine ground rules carried from round 10:
- levenshtein: Spark counts CODEPOINTS, DuckDB counts BYTES — every key
  is ASCII-sanitized on both engines before any distance math.
- Seeded randomness is ENGINE-LOCAL: Spark's uniform(lo, hi, seed) and
  DuckDB's random() produce different streams, so q102 gates
  STRUCTURAL INVARIANTS each engine computes over its own generated
  data (row count, range bounds, key shape) — identical invariant rows,
  never value-identical data. The invariants are seed-FREE by design,
  so the oracle runs an unseeded random() stream (no setseed needed). The Spark side additionally gates
  run-to-run determinism (two same-seed scans must agree), which the
  oracle pins as the expected literal since DuckDB cannot scope two
  independent seeded streams inside one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND10B: dict = {}

# ---------------------------------------------------------------- d71

# d70 (substitution-1, depth-1 deletion signatures) is EXACT blocking;
# at distance 2 the FastSS guarantee (Bocek et al. 2007, public) becomes
# recall-only: keys within edit distance k share a variant in their
# depth-k DELETION neighborhoods (sub->delete both sides, del/ins->
# delete the longer side, ins+del->delete one each), but a shared
# variant only bounds the distance by d1+d2 <= 4 — so a levenshtein
# VERIFY stage prunes candidates to true ed<=2 pairs. Candidate volume
# stays output-bound because the key is HIGH-ENTROPY: a 20-hex-char
# record identifier (md5-derived — the serial-number/UUID typo-linkage
# shape of entity resolution). Low-entropy keys would break the bound:
# c_name's constant 'Customer#000' prefix is exactly why d70 had to
# argue its blocking differently, and documents.text's small word
# vocabulary makes identical prefixes collide quadratically. For THAT
# regime use d73 (plans/round10c.py): single-edited-token blocking
# whose block key carries the residual name, so vocabulary frequency
# cannot inflate candidates.
_D71_MAXDIST = 2
_D71_KEYLEN = 20          # variant fan is ~(KEYLEN^2)/2 per key: ~231 at 20
_D71_ALIAS_OFFSET = 10_000_000


def d71_fuzzy_dedup_depth2(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution fuzzy dedup, general edit distance <= 2:
    deterministic typo'd aliases (1 or 2 of substitute/delete/insert,
    position and op chosen by arithmetic on the key id — both engines
    rebuild the identical corrupted corpus) are injected for every 4th
    customer, then recovered by depth-2 deletion-neighborhood blocking +
    levenshtein verify. Recall evidence is IN the output: every injected
    alias is at true ed <= 2 from its source by construction, so
    n_injected_found == n_aliases; precision evidence: n_pairs counts
    only verified ed <= 2 among candidates (n_cand >= n_pairs, the gap
    is the blocking's ed-3/4 leakage that the verify prunes).

    Scale shape: linear ~KEYLEN^2/2-fold row expansion per key (bounded
    fan, no data-dependent blowup), DISTINCT on (id, sig) then one
    equi-join on the signature — block sizes are O(true matches) on
    high-entropy keys, so candidate generation is output-bound; verify
    cost is per-candidate, not per-pair-of-records. This is the
    10^9-key layout: no all-pairs stage anywhere.
    """
    cust = t(spark, sf, "customer")
    # md5 hex is ASCII on both engines, so the codepoint-vs-byte
    # levenshtein divergence can never bite; entropy makes signature
    # blocks O(true matches)
    base = cust.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.expr(f"substring(md5(c_name), 1, {_D71_KEYLEN})").alias("key"))
    # Deterministic corruption for id % 4 == 0: edit 1 at pos1 (op by
    # id div 4 mod 3), then for id % 8 == 0 a second edit — always a
    # substitution at a different position ON THE EDITED STRING, giving
    # true distance-2 pairs (sub+sub, del+sub, ins+sub).
    edit1 = """
      CASE pmod(id div 4, 3)
        WHEN 0 THEN concat(substring(key, 1, p1 - 1), 'q',
                           substring(key, p1 + 1))
        WHEN 1 THEN concat(substring(key, 1, p1 - 1),
                           substring(key, p1 + 1))
        ELSE concat(substring(key, 1, p1 - 1), 'x',
                    substring(key, p1))
      END"""
    aliases = (base.filter(F.expr("id % 4 = 0"))
               .withColumn("p1", F.expr("pmod(id * 7, length(key)) + 1"))
               .withColumn("k1", F.expr(edit1))
               .withColumn("p2", F.expr(
                   "pmod(id * 13, greatest(length(k1) - 1, 1)) + 1"))
               .withColumn("p2", F.expr(
                   "CASE WHEN p2 = p1 THEN p2 + 1 ELSE p2 END"))
               .select(
                   (F.col("id") + F.lit(_D71_ALIAS_OFFSET)).alias("id"),
                   F.expr("CASE WHEN id % 8 = 0 THEN "
                          "concat(substring(k1, 1, p2 - 1), 'z', "
                          "substring(k1, p2 + 1)) ELSE k1 END")
                   .alias("key")))
    corpus = base.unionByName(aliases)
    # spread the ~(1 + L + C(L,2))-fold variant generation across the
    # session's full width: customer at gate scale is a one-split scan,
    # so the whole explode+substring cascade below otherwise runs in a
    # single task before the checkpoint (the d57 finding, optimization
    # r12). 8-byte ids + 16-char keys — a trivial exchange.
    corpus = corpus.repartition(
        spark.sparkContext.defaultParallelism, F.col("id"))
    # depth-<=2 deletion neighborhood, generated CANONICALLY as ordered
    # original-position pairs p < q (plus p=0 single/identity forms):
    # 1 + L + C(L,2) rows per key instead of the (L+1)^2 grid of
    # "delete-then-delete-the-result", and no dedup shuffle — the
    # sequential encoding reached each depth-2 variant twice and needed
    # a corpus-sized DISTINCT before the join (measured 12.9 s at sf0.1;
    # this form runs the same blocking in roughly half the rows and one
    # fewer shuffle). Duplicate variants from repeated characters remain
    # possible; the pair-level DISTINCT after the join absorbs them.
    sigs = (corpus
            .select("id", "key",
                    F.explode(F.expr("sequence(0, length(key))"))
                    .alias("p"))
            .select("id", "key", "p",
                    F.explode(F.expr("sequence(0, length(key))"))
                    .alias("q"))
            .filter("p = 0 OR q > p")  # codegen filter, pre-shuffle
            .select("id", "key", F.expr(
                "CASE WHEN p = 0 AND q = 0 THEN key "
                "WHEN p = 0 THEN concat(substring(key, 1, q - 1), "
                "substring(key, q + 1)) "
                "ELSE concat(substring(key, 1, p - 1), "
                "substring(key, p + 1, q - p - 1), "
                "substring(key, q + 1)) END").alias("sig"))
            # materialize ONCE: the self-join otherwise re-runs the whole
            # corpus->explode->variant subtree for each side (the plan
            # showed two identical Generate chains), and post-explode
            # size estimates are garbage (the planner broadcast a ~211x
            # exploded relation it thought was parquet-file-sized). The
            # checkpoint halves signature generation AND gives the join
            # real stats, so broadcast-vs-SMJ is decided on the true
            # signature-table size at any scale (optimization r11).
            .localCheckpoint())
    a = sigs.select(F.col("id").alias("id_a"), F.col("key").alias("key_a"),
                    "sig")
    b = sigs.select(F.col("id").alias("id_b"), F.col("key").alias("key_b"),
                    "sig")
    cand = (a.join(b, "sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "key_a", "key_b")
            .distinct()
            .select("id_a", "id_b",
                    F.levenshtein("key_a", "key_b").alias("dist")))
    return cand.agg(
        F.count("*").cast("long").alias("n_cand"),
        F.sum(F.when(F.col("dist") <= _D71_MAXDIST, 1).otherwise(0))
        .cast("long").alias("n_pairs"),
        F.sum(F.when((F.col("id_b") - F.col("id_a")
                      == _D71_ALIAS_OFFSET)
                     & (F.col("dist") <= _D71_MAXDIST), 1).otherwise(0))
        .cast("long").alias("n_injected_found"),
        F.min("dist").cast("long").alias("min_dist"),
        F.max("dist").cast("long").alias("max_dist"))


D71_SQL = f"""
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         substring(md5(c_name), 1, {_D71_KEYLEN}) AS key
  FROM customer
),
e1 AS (
  SELECT id, key, (id * 7) % length(key) + 1 AS p1 FROM base
  WHERE id % 4 = 0
),
e1b AS (
  SELECT id, key, p1,
         CASE (id // 4) % 3
           WHEN 0 THEN concat(substring(key, 1, p1 - 1), 'q',
                              substring(key, p1 + 1))
           WHEN 1 THEN concat(substring(key, 1, p1 - 1),
                              substring(key, p1 + 1))
           ELSE concat(substring(key, 1, p1 - 1), 'x',
                       substring(key, p1))
         END AS k1
  FROM e1
),
e2 AS (
  SELECT id, p1, k1,
         (id * 13) % greatest(length(k1) - 1, 1) + 1 AS p2_raw
  FROM e1b
),
aliases AS (
  SELECT id + {_D71_ALIAS_OFFSET} AS id,
         CASE WHEN id % 8 = 0 THEN
           concat(substring(k1, 1, p2 - 1), 'z', substring(k1, p2 + 1))
         ELSE k1 END AS key
  FROM (SELECT id, k1,
               CASE WHEN p2_raw = p1 THEN p2_raw + 1 ELSE p2_raw END AS p2
        FROM e2)
),
corpus AS (SELECT id, key FROM base UNION ALL SELECT id, key FROM aliases),
sigs AS (
  -- canonical p < q original-position deletion pairs (see the Spark
  -- side): no DISTINCT here; the pair-level DISTINCT in cand absorbs
  -- duplicate variants from repeated characters
  SELECT id, key,
         CASE WHEN p = 0 AND q = 0 THEN key
              WHEN p = 0 THEN concat(substring(key, 1, q - 1),
                                     substring(key, q + 1))
              ELSE concat(substring(key, 1, p - 1),
                          substring(key, p + 1, q - p - 1),
                          substring(key, q + 1)) END AS sig
  FROM (SELECT id, key, p, unnest(generate_series(0, length(key))) AS q
        FROM (SELECT id, key, unnest(generate_series(0, length(key))) AS p
              FROM corpus))
  WHERE p = 0 OR q > p
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.key AS key_a,
                  b.key AS key_b
  FROM sigs a JOIN sigs b ON a.sig = b.sig
  WHERE a.id < b.id
),
verified AS (
  SELECT id_a, id_b, levenshtein(key_a, key_b) AS dist FROM cand
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       CAST(SUM(CASE WHEN dist <= {_D71_MAXDIST} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN id_b - id_a = {_D71_ALIAS_OFFSET}
                      AND dist <= {_D71_MAXDIST} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_injected_found,
       CAST(MIN(dist) AS BIGINT) AS min_dist,
       CAST(MAX(dist) AS BIGINT) AS max_dist
FROM verified
"""

ROUND10B.update({
    "d71_fuzzy_dedup_depth2": (d71_fuzzy_dedup_depth2, D71_SQL),
})

# --------------------------------------------------------------- q102

_Q102_N = 100_000
_Q102_PARTS = 16   # pinned: uniform()'s stream is a function of
#                    (seed, partition layout) — probed live: same seed,
#                    4 vs 32 range partitions -> different sums; same
#                    seed + same layout -> bit-identical across runs


def q102_seeded_synthetic_generator(spark: SparkSession,
                                    sf: str) -> DataFrame:
    """Seeded in-engine synthetic data generation — the TESTDATA
    generator's idiom, engine-side (probe-live `uniform()`/`randstr()`,
    never previously queried). Generates 100k rows of (uniform bigint,
    16-char random key) and gates the generator CONTRACT: exact row
    count, closed range bounds, key shape ([A-Za-z0-9]{16}), and
    run-to-run determinism (two independent same-seed scans over the
    same pinned partition layout must produce identical streams —
    compared by sum + xor-style parity, not samples).

    The oracle regenerates with DuckDB's own (unseeded) random/md5
    stream and computes the SAME invariants over its own data — every
    gated invariant is seed-independent by design, so no setseed is
    needed; `deterministic` is pinned as the expected literal on the
    oracle side because DuckDB cannot scope two independently-seeded
    streams inside one query (a documented one-sided gate, like the
    engine-only halves of q96).

    Scale shape: no input scan at all — two embarrassingly parallel
    range generators, one single-row aggregate each; at cluster scale
    this is the shape of seeded synthetic-corpus jobs (rows/partition
    pinned by the layout, never a driver-side loop).
    """
    gen = (f"SELECT uniform(0, 9999, 42) AS u, randstr(16, 7) AS s "
           f"FROM range(0, {_Q102_N}, 1, {_Q102_PARTS})")
    # Two INDEPENDENT evaluations of the same seeded stream. The second
    # carries a semantically-neutral `WHERE u >= 0` so its plan differs
    # textually — otherwise Catalyst's ReuseSubquery would execute the
    # scalar subquery ONCE and the determinism gate would compare a
    # value with itself (vacuously true even on a broken generator).
    return spark.sql(f"""
        WITH g AS ({gen})
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               min(u) >= 0 AND max(u) <= 9999 AS u_in_range,
               CAST(sum(CASE WHEN s RLIKE '^[A-Za-z0-9]{{16}}$'
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_key,
               (SELECT struct(sum(u), sum(u * u), count(*))
                FROM ({gen})) =
               (SELECT struct(sum(u), sum(u * u), count(*))
                FROM ({gen}) WHERE u >= 0) AS deterministic
        FROM g
    """)


Q102_SQL = f"""
WITH g AS (
  SELECT CAST(floor(random() * 10000) AS BIGINT) AS u,
         substring(md5(CAST(random() AS VARCHAR)), 1, 16) AS s
  FROM generate_series(1, {_Q102_N})
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(u) >= 0 AND MAX(u) <= 9999 AS u_in_range,
       CAST(SUM(CASE WHEN regexp_matches(s, '^[A-Za-z0-9]{{16}}$')
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_key,
       true AS deterministic
FROM g
"""

ROUND10B.update({
    "q102_seeded_synthetic_generator": (q102_seeded_synthetic_generator,
                                        Q102_SQL),
})
