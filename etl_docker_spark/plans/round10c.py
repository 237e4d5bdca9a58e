"""Round-10 build: fuzzy dedup that survives LOW-ENTROPY natural keys
(VERDICT r9 item 3 — the admitted gap in d71's whole-string deletion
blocking, plans/round10b.py: shared constant prefixes and small word
vocabularies make whole-string deletion neighborhoods collide
quadratically even where the true-match output is small).

The fix is a CHANGE OF BLOCKING UNIT, not a bigger neighborhood: real
entity-resolution typos live inside ONE token of a multi-token name
("ACME Corp Ltd" vs "ACNE Corp Ltd" — the reference's own J1 join keys
are supplier/customer names, Funciones_CotyData.py:189-208). Under the
single-edited-token model the block key is

    (token position i, ALL OTHER tokens verbatim, depth-1 deletion
     variant of token i)

so the residual name — not the edited token — carries the block
entropy. A 24-word vocabulary shared by thousands of names cannot
inflate candidates, because two names only meet in a block when they
already agree on every other token: candidate volume is bounded by the
true-match volume plus the depth-1 leakage (token ed <= 2), never by
vocabulary frequency. FastSS (Bocek et al. 2007) at k=1 makes the
per-token blocking EXACT-recall; a levenshtein verify prunes the ed-2
leakage.

Cross-engine ground rules as in round10b: all tokens are ASCII by
construction (codepoint-vs-byte levenshtein parity), and the oracle is
an INDEPENDENT brute-force over all pairs — not a re-implementation of
the blocking — so the correctness gate is a genuine recall AND
precision check of the blocking against ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND10C: dict = {}

# ---------------------------------------------------------------- d73

# pairwise edit distance >= 2, no deletion of one equals another, and no
# 'q'/'x' (the substitution/insertion characters) anywhere — so every
# injected corruption is at true token distance EXACTLY 1 and never
# lands on a vocabulary word (tests/test_plans_round10c.py pins all
# three properties)
_D73_VOCAB = ("alder birch cedar delta ember ferro grove helio indigo "
              "jasper kappa lemon mango nylon ocean piano river stone "
              "tulip tiger viola wheat yodel zebra").split()
_D73_V = "array(" + ", ".join(f"'{w}'" for w in _D73_VOCAB) + ")"
_D73_V_DUCK = "[" + ", ".join(f"'{w}'" for w in _D73_VOCAB) + "]"
_D73_NTOK = 4
_D73_ALIAS_OFFSET = 10_000_000

# tokens 1-3 = the base-24 digits of nid (INDEPENDENT, 13,824 reachable
# combinations — an earlier design derived all three from nid % 24,
# which made them perfectly correlated: every 24th name shared its full
# vocab prefix and true-duplicate pairs grew QUADRATICALLY, ~N^2/1200
# exact pairs, 18M at ~sf1 — the output itself was the blow-up, not the
# blocking); token 4 is a 'no'||3-digit account fragment — 1000
# distinct values corpus-wide, the deliberately DEGENERATE low-entropy
# token (at 2 digits the 10x replica corpus produced ~240k natural typo
# pairs — quadratic with a 1/72k constant; 3 digits cuts the per-class
# match probability 7x while staying low-entropy).
# Natural full-name collisions need nid agreement mod
# lcm(13824, 1000) = 1,728,000 — none below ~sf10 — so exact-duplicate
# coverage comes from LINEAR alias injection instead (every 10th id).


def _d73_spark_tokens() -> str:
    toks = [f"element_at({_D73_V}, "
            f"CAST((nid div {24 ** j}) % 24 AS INT) + 1)"
            for j in range(3)]
    toks.append("concat('no', lpad(CAST(nid % 1000 AS STRING), 3, '0'))")
    return "array(" + ", ".join(toks) + ")"


def d73_low_entropy_fuzzy_dedup(spark: SparkSession,
                                sf: str) -> DataFrame:
    """Single-edited-token fuzzy dedup on a c_name-DERIVED 4-token
    natural key built from a 24-word vocabulary plus a 1000-value
    account fragment (heavy token sharing — the regime d71's docstring
    concedes). Deterministic typo'd aliases (one sub/del/ins inside one
    token, position and op by arithmetic on the id — both engines
    rebuild the identical corpus) are injected for every 4th customer,
    and verbatim exact-duplicate aliases for every 10th — both LINEAR,
    so the true-duplicate volume (and with it the blocking join's
    output) scales linearly with the corpus.

    Match semantics: two names are duplicates iff their token sequences
    are identical (exact duplicate, distance 0) or differ in exactly
    one position whose tokens are within edit distance 1 (typo
    duplicate). Blocking: per token position, key = (position, other
    tokens verbatim, FastSS depth-1 deletion variant) — exact recall at
    k=1; shared-variant leakage reaches token ed 2 and is pruned by a
    levenshtein verify. The ORACLE brute-forces all pairs instead of
    replaying the blocking, so the gate proves recall == 1.0 and
    precision == 1.0 against ground truth, not self-consistency.

    Scale shape: bounded fan (4 positions x (len+1) variants ~ 28 rows
    per name), one equi-join on the composite signature, pair-level
    DISTINCT, per-candidate verify. Block sizes are bounded by names
    agreeing on ALL other tokens — vocabulary frequency cannot inflate
    them; mass-identical names grow blocks only where the output itself
    grows (they ARE duplicates). No all-pairs stage anywhere; the
    brute-force exists only on the DuckDB oracle side at gate SF.
    """
    cust = t(spark, sf, "customer")
    # nid = ALL digits of the name, not a fixed offset: the 10x replica
    # corpus prefixes customer names with a replica tag
    # ('9999-Customer#000014999'), which both breaks a positional
    # substring (ANSI cast throws on 'omer#0000' — killed the first
    # round-10 sf1 bench run) and, folded into nid, keeps replica
    # name spaces disjoint instead of mass-colliding.
    base = (cust.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.expr("CAST(regexp_replace(c_name, '[^0-9]', '') AS BIGINT)")
        .alias("nid"))
        .select("id", F.expr(_d73_spark_tokens()).alias("toks")))
    # exact-duplicate aliases: every 10th id re-enters VERBATIM (linear
    # injection — the natural name space is collision-free below ~sf10
    # by design, see the token comment above)
    exacts = (base.filter("id % 10 = 5")
              .select((F.col("id") + F.lit(2 * _D73_ALIAS_OFFSET))
                      .alias("id"), "toks"))
    aliases = (base.filter("id % 4 = 0")
               .withColumn("ti", F.expr(
                   "CAST((id div 4) % 4 AS INT) + 1"))
               .withColumn("tok", F.expr("element_at(toks, ti)"))
               .withColumn("p", F.expr(
                   "CAST(id % length(tok) AS INT) + 1"))
               .withColumn("ct", F.expr("""
                   CASE (id div 16) % 3
                     WHEN 0 THEN concat(substring(tok, 1, p - 1), 'q',
                                        substring(tok, p + 1))
                     WHEN 1 THEN concat(substring(tok, 1, p - 1),
                                        substring(tok, p + 1))
                     ELSE concat(substring(tok, 1, p - 1), 'x',
                                 substring(tok, p))
                   END"""))
               .select((F.col("id") + F.lit(_D73_ALIAS_OFFSET))
                       .alias("id"),
                       F.expr("transform(toks, (t, j) -> "
                              "CASE WHEN j + 1 = ti THEN ct ELSE t END)")
                       .alias("toks")))
    corpus = base.unionByName(aliases).unionByName(exacts)
    # blocking signatures: 4 positions x (identity + per-char deletion)
    sigs = (corpus
            .select("id", "toks",
                    F.explode(F.expr(f"sequence(1, {_D73_NTOK})"))
                    .alias("i"))
            .select("id",
                    F.expr("element_at(toks, i)").alias("tok"),
                    F.expr(f"concat(CAST(i AS STRING), '|', "
                           f"concat_ws(' ', slice(toks, 1, i - 1)), '|', "
                           f"concat_ws(' ', slice(toks, i + 1, "
                           f"{_D73_NTOK} - i)))").alias("rest"))
            .select("id", "tok", "rest",
                    F.explode(F.expr("sequence(0, length(tok))"))
                    .alias("p"))
            .select("id", "tok", F.concat(
                F.col("rest"), F.lit("|"),
                F.expr("CASE WHEN p = 0 THEN tok "
                       "ELSE concat(substring(tok, 1, p - 1), "
                       "substring(tok, p + 1)) END")).alias("sig")))
    a = sigs.select(F.col("id").alias("id_a"),
                    F.col("tok").alias("tok_a"), "sig")
    b = sigs.select(F.col("id").alias("id_b"),
                    F.col("tok").alias("tok_b"), "sig")
    verified = (a.join(b, "sig")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        F.levenshtein("tok_a", "tok_b").alias("dist"))
                .distinct()
                .filter(F.col("dist") <= 1))
    stats = verified.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dist") == 0, 1).otherwise(0)).cast("long")
        .alias("n_exact_pairs"),
        F.sum(F.when(F.col("dist") == 1, 1).otherwise(0)).cast("long")
        .alias("n_typo_pairs"),
        F.sum(F.when(F.col("id_b") - F.col("id_a")
                     == _D73_ALIAS_OFFSET, 1).otherwise(0)).cast("long")
        .alias("n_injected_found"),
        F.sum(F.when(F.col("id_b") - F.col("id_a")
                     == 2 * _D73_ALIAS_OFFSET, 1).otherwise(0))
        .cast("long").alias("n_exact_injected_found"))
    counts = corpus.agg(
        F.count("*").cast("long").alias("n_names"),
        # replica corpora carry base ids >= 10^9, so alias membership
        # is a MODULAR band, not a magnitude test (within-replica keys
        # stay far below OFFSET for any corpus under ~sf60)
        F.sum(F.when(F.expr(f"pmod(id, 1000000000) >= "
                            f"{_D73_ALIAS_OFFSET}"), 1).otherwise(0))
        .cast("long").alias("n_aliases"))
    return counts.crossJoin(stats)  # two 1-row frames


def _d73_duck_tokens() -> str:
    toks = [f"{_D73_V_DUCK}[CAST((nid // {24 ** j}) % 24 AS INT) + 1] "
            f"AS t{j + 1}"
            for j in range(3)]
    toks.append("'no' || lpad(CAST(nid % 1000 AS VARCHAR), 3, '0') AS t4")
    return ", ".join(toks)


D73_SQL = f"""
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS nid
  FROM customer
),
named AS (
  SELECT id, {_d73_duck_tokens()} FROM base
),
picked AS (
  SELECT id, t1, t2, t3, t4,
         ((id // 4) % 4) + 1 AS ti,
         CASE ((id // 4) % 4) + 1
           WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3 ELSE t4
         END AS tok
  FROM named WHERE id % 4 = 0
),
edited AS (
  SELECT *, (id % length(tok)) + 1 AS p FROM picked
),
corrupted AS (
  SELECT id, t1, t2, t3, t4, ti,
         CASE (id // 16) % 3
           WHEN 0 THEN substring(tok, 1, p - 1) || 'q'
                       || substring(tok, p + 1)
           WHEN 1 THEN substring(tok, 1, p - 1) || substring(tok, p + 1)
           ELSE substring(tok, 1, p - 1) || 'x' || substring(tok, p)
         END AS ct
  FROM edited
),
aliases AS (
  SELECT id + {_D73_ALIAS_OFFSET} AS id,
         CASE WHEN ti = 1 THEN ct ELSE t1 END AS t1,
         CASE WHEN ti = 2 THEN ct ELSE t2 END AS t2,
         CASE WHEN ti = 3 THEN ct ELSE t3 END AS t3,
         CASE WHEN ti = 4 THEN ct ELSE t4 END AS t4
  FROM corrupted
),
exacts AS (
  SELECT id + {2 * _D73_ALIAS_OFFSET} AS id, t1, t2, t3, t4
  FROM named WHERE id % 10 = 5
),
corpus AS (
  SELECT id, t1, t2, t3, t4 FROM named UNION ALL
  SELECT id, t1, t2, t3, t4 FROM aliases UNION ALL
  SELECT id, t1, t2, t3, t4 FROM exacts
),
-- INDEPENDENT ground truth: brute-force all pairs (gate-SF only; the
-- engine side never does this)
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(a.t1 != b.t1 AS INT) + CAST(a.t2 != b.t2 AS INT)
           + CAST(a.t3 != b.t3 AS INT) + CAST(a.t4 != b.t4 AS INT) AS nd,
         CASE WHEN a.t1 != b.t1 THEN levenshtein(a.t1, b.t1)
              WHEN a.t2 != b.t2 THEN levenshtein(a.t2, b.t2)
              WHEN a.t3 != b.t3 THEN levenshtein(a.t3, b.t3)
              WHEN a.t4 != b.t4 THEN levenshtein(a.t4, b.t4)
              ELSE 0 END AS dist
  FROM corpus a JOIN corpus b ON a.id < b.id
),
matched AS (
  SELECT * FROM pairs WHERE nd = 0 OR (nd = 1 AND dist <= 1)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_names,
       (SELECT CAST(SUM(CASE WHEN id % 1000000000
                                  >= {_D73_ALIAS_OFFSET}
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM corpus) AS n_aliases,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN nd = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_pairs,
       CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_typo_pairs,
       CAST(SUM(CASE WHEN id_b - id_a = {_D73_ALIAS_OFFSET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_injected_found,
       CAST(SUM(CASE WHEN id_b - id_a = {2 * _D73_ALIAS_OFFSET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_injected_found
FROM matched
"""

ROUND10C.update({
    "d73_low_entropy_fuzzy_dedup": (d73_low_entropy_fuzzy_dedup,
                                    D73_SQL),
})
