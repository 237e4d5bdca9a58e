"""Round-11 build: the fuzzy-dedup ladder's combined rung — TOKEN
TRANSPOSITION *and* an in-token typo in the same candidate pair
(VERDICT r10 item 3: real entity duplicates reorder tokens AND carry a
typo at once — "Ltd ACNE Corp" vs "ACME Corp Ltd", the reference's J1
supplier/customer name keys, Funciones_CotyData.py:189-208 — a shape
neither d72's exact sorted-token signature nor d73's positional
blocking reaches on its own).

The blocking unit composes the two proven units:
  d72's unit: SORT the tokens, so word order stops existing before
  blocking ever happens;
  d73's unit: single out ONE token for a FastSS depth-1 deletion
  variant, carry every OTHER token verbatim as the block entropy.

Block key = (sorted multiset of the other tokens, verbatim | depth<=1
deletion variant of the singled-out token). Two names collide iff
their token multisets agree on all but (at most) one token whose pair
is within edit distance 2; a levenshtein verify prunes the ed-2
leakage. Recall is exact by the FastSS k=1 argument applied per
multiset slot; precision is exact after the verify. Vocabulary
frequency cannot inflate blocks for the same reason as d73: collision
requires agreement on the ENTIRE residual multiset, so candidate
volume tracks true-match volume (the sorted rest admits at most the
token-permutation factor — bounded by NTOK! — over d73's positional
blocks, and those permuted names are precisely the transposition
duplicates the query exists to find).

The ORACLE is an INDEPENDENT all-pairs brute force (like d73's): for
every id pair it aligns the two sorted token lists by trying all
NTOK x NTOK remove-one-token combinations and takes the minimum
levenshtein over exact-leftover alignments — no signatures, no
blocking replay — so the driver gate is a true recall=1.0 AND
precision=1.0 check against ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t
from etl_docker_spark.plans.round10c import (_d73_duck_tokens,
                                             _d73_spark_tokens)

ROUND11B: dict = {}

# ---------------------------------------------------------------- d75

_D75_NTOK = 4
_D75_ALIAS_OFFSET = 10_000_000


def _d75_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The d75 corpus: d73's 4-token natural key per customer plus two
    LINEAR alias classes — rotation-only (every 10th id, +2*OFFSET)
    and rotation+typo (every 4th id, +OFFSET). Returns (id, st) with
    st = the SORTED token array. Shared with d76 (round13.py)."""
    cust = t(spark, sf, "customer")
    # nid from ALL name digits — replica-safe (see round10c.py)
    base = (cust.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.expr("CAST(regexp_replace(c_name, '[^0-9]', '') AS BIGINT)")
        .alias("nid"))
        .select("id", F.expr(_d73_spark_tokens()).alias("toks")))
    rot = "1 + pmod(id, 3)"
    rotated = (f"concat(slice(toks, ({rot}) + 1, {_D75_NTOK}), "
               f"slice(toks, 1, {rot}))")
    # rotation-only aliases: every 10th id, token order scrambled,
    # content verbatim -> true multiset-equal duplicates (dist 0)
    rot_only = (base.filter("id % 10 = 5")
                .select((F.col("id") + F.lit(2 * _D75_ALIAS_OFFSET))
                        .alias("id"),
                        F.expr(rotated).alias("toks")))
    # rotation+typo aliases: every 4th id — rotate, then corrupt one
    # char of one token (d73's op table, on the ROTATED position)
    rot_typo = (base.filter("id % 4 = 0")
                .select("id", F.expr(rotated).alias("toks"))
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
                .select((F.col("id") + F.lit(_D75_ALIAS_OFFSET))
                        .alias("id"),
                        F.expr("transform(toks, (t, j) -> "
                               "CASE WHEN j + 1 = ti THEN ct ELSE t "
                               "END)").alias("toks")))
    return (base.unionByName(rot_typo).unionByName(rot_only)
            .select("id", F.sort_array("toks").alias("st")))


def _d75_verified_pairs(corpus: DataFrame) -> DataFrame:
    """Blocking + verify: (id_a, id_b, dist) with id_a < id_b and
    dist <= 1 — the exact-recall/exact-precision duplicate pair frame
    (see d75's docstring for the argument). Shared with d76."""
    # signatures: NTOK multiset slots x (identity + per-char deletion);
    # rest = the OTHER tokens of the SORTED list, verbatim
    sigs = (corpus
            .select("id", "st",
                    F.explode(F.expr(f"sequence(1, {_D75_NTOK})"))
                    .alias("i"))
            .select("id",
                    F.expr("element_at(st, i)").alias("tok"),
                    F.expr(f"concat_ws(' ', concat("
                           f"slice(st, 1, i - 1), "
                           f"slice(st, i + 1, {_D75_NTOK} - i)))")
                    .alias("rest"))
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
    return (a.join(b, "sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.levenshtein("tok_a", "tok_b").alias("dist"))
            .distinct()
            .filter(F.col("dist") <= 1))


def d75_transposed_typo_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Order-insensitive single-edited-token fuzzy dedup over d73's
    4-token low-entropy natural key corpus. Two alias classes are
    injected, both LINEAR in corpus size and both rebuilt identically
    by the oracle:
      - every 4th customer: ROTATE the tokens by 1 + id%3 positions,
        then corrupt one char of one token (sub 'q' / delete /
        insert 'x', position and op by arithmetic on the id) —
        transposition AND typo in one alias (the target shape);
      - every 10th customer (id%10=5): rotation only — pure
        transposition duplicates at token distance 0.

    Match semantics: duplicates iff token MULTISETS are equal
    (dist 0), or the multisets differ in exactly one token pair within
    edit distance 1 (dist 1). Word order never matters.

    Blocking: tokens sorted first (d72's unit), then per multiset slot
    i the key is (sorted rest verbatim, FastSS depth<=1 deletion
    variant of token i) (d73's unit) — ~NTOK x (len+1) ~ 26 signatures
    per name, one equi-join on the composite signature, pair-level
    DISTINCT, levenshtein verify pruning the depth-1-leakage (token
    ed 2) candidates. No all-pairs anywhere on the engine side; the
    brute force exists only in the DuckDB oracle at gate SF.

    Scale shape: bounded fan, block entropy carried by the 3-token
    residual multiset (vocabulary frequency cannot inflate candidate
    volume — names must agree on every other token, in any order), and
    the final crossJoin is 1-row x 1-row stats assembly (pinned
    no-cartesian in tests/test_plans_round11b.py).
    """
    corpus = _d75_corpus(spark, sf)
    verified = _d75_verified_pairs(corpus)
    stats = verified.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dist") == 0, 1).otherwise(0)).cast("long")
        .alias("n_multiset_pairs"),
        F.sum(F.when(F.col("dist") == 1, 1).otherwise(0)).cast("long")
        .alias("n_typo_pairs"),
        F.sum(F.when(F.col("id_b") - F.col("id_a")
                     == _D75_ALIAS_OFFSET, 1).otherwise(0)).cast("long")
        .alias("n_rot_typo_found"),
        F.sum(F.when(F.col("id_b") - F.col("id_a")
                     == 2 * _D75_ALIAS_OFFSET, 1).otherwise(0))
        .cast("long").alias("n_rot_only_found"))
    counts = corpus.agg(
        F.count("*").cast("long").alias("n_names"),
        F.sum(F.when(F.expr(f"pmod(id, 1000000000) >= "
                            f"{_D75_ALIAS_OFFSET}"), 1).otherwise(0))
        .cast("long").alias("n_aliases"))
    return counts.crossJoin(stats)  # two 1-row frames


# corpus + brute-force scoring CTE members, shared with d76's oracle
# (round13.py) which extends them with a recursive transitive closure
_D75_ORACLE_CTES = f"""base AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS nid
  FROM customer
),
named AS (
  SELECT id, {_d73_duck_tokens()} FROM base
),
listed AS (
  SELECT id, [t1, t2, t3, t4] AS toks FROM named
),
rotated AS (
  SELECT id, toks[r + 1:] || toks[1:r] AS toks
  FROM (SELECT id, toks, 1 + id % 3 AS r FROM listed)
),
rot_only AS (
  SELECT id + {2 * _D75_ALIAS_OFFSET} AS id, toks
  FROM rotated WHERE id % 10 = 5
),
rt_picked AS (
  SELECT id, toks, ((id // 4) % 4) + 1 AS ti,
         toks[((id // 4) % 4) + 1] AS tok
  FROM rotated WHERE id % 4 = 0
),
rt_edited AS (
  SELECT *, (id % length(tok)) + 1 AS p FROM rt_picked
),
rt_corrupted AS (
  SELECT id, toks, ti,
         CASE (id // 16) % 3
           WHEN 0 THEN substring(tok, 1, p - 1) || 'q'
                       || substring(tok, p + 1)
           WHEN 1 THEN substring(tok, 1, p - 1) || substring(tok, p + 1)
           ELSE substring(tok, 1, p - 1) || 'x' || substring(tok, p)
         END AS ct
  FROM rt_edited
),
rot_typo AS (
  SELECT id + {_D75_ALIAS_OFFSET} AS id,
         [CASE WHEN ti = 1 THEN ct ELSE toks[1] END,
          CASE WHEN ti = 2 THEN ct ELSE toks[2] END,
          CASE WHEN ti = 3 THEN ct ELSE toks[3] END,
          CASE WHEN ti = 4 THEN ct ELSE toks[4] END] AS toks
  FROM rt_corrupted
),
corpus AS (
  SELECT id, list_sort(toks) AS st
  FROM (SELECT id, toks FROM listed UNION ALL
        SELECT id, toks FROM rot_typo UNION ALL
        SELECT id, toks FROM rot_only)
),
-- INDEPENDENT ground truth: all pairs, aligned by trying every
-- remove-one-token combination of the two SORTED lists and keeping the
-- minimum levenshtein over exact-leftover alignments (gate-SF only;
-- the engine never does this)
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, a.st AS sa, b.st AS sb
  FROM corpus a JOIN corpus b ON a.id < b.id
),
scored AS (
  SELECT id_a, id_b,
         MIN(CASE WHEN list_slice(sa, 1, i - 1)
                       || list_slice(sa, i + 1, {_D75_NTOK})
                     = list_slice(sb, 1, j - 1)
                       || list_slice(sb, j + 1, {_D75_NTOK})
                  THEN levenshtein(sa[i], sb[j]) END) AS dist
  FROM pairs,
       generate_series(1, {_D75_NTOK}) g1(i),
       generate_series(1, {_D75_NTOK}) g2(j)
  GROUP BY id_a, id_b
),
matched AS (
  SELECT * FROM scored WHERE dist <= 1
)"""

D75_SQL = f"""
WITH {_D75_ORACLE_CTES}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_names,
       (SELECT CAST(SUM(CASE WHEN id % 1000000000
                                  >= {_D75_ALIAS_OFFSET}
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM corpus) AS n_aliases,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multiset_pairs,
       CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_typo_pairs,
       CAST(SUM(CASE WHEN id_b - id_a = {_D75_ALIAS_OFFSET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_rot_typo_found,
       CAST(SUM(CASE WHEN id_b - id_a = {2 * _D75_ALIAS_OFFSET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_rot_only_found
FROM matched
"""

ROUND11B.update({
    "d75_transposed_typo_dedup": (d75_transposed_typo_dedup, D75_SQL),
})

# ---------------------------------------------------------------- q105


def q105_validate_utf8_battery(spark: SparkSession,
                               sf: str) -> DataFrame:
    """The validate_utf8 family (is_valid_utf8 / try_validate_utf8 /
    validate_utf8 / make_valid_utf8), gated against an ARITHMETIC
    oracle (NOTES_r10 carry-over #5: DuckDB rejects invalid UTF-8 in
    VARCHAR entirely, so no cross-engine route can materialize the
    corrupted strings — instead the oracle derives every expected
    count from the injection arithmetic and `length(text)` alone).

    Deterministic byte-level corruption over the ASCII document corpus
    (ascii-ness is itself checked per row, so a non-ASCII future corpus
    degrades to 'clean' instead of breaking the arithmetic):
      - id%3=0: SUBSTITUTE the byte at pmod(id, len)+1 with 0xFF
        (invalid everywhere in UTF-8) — repaired char length is
        UNCHANGED (exactly one U+FFFD per invalid byte, probed live);
      - id%3=1 and id%5=0: APPEND 0xC2 (a lead byte with no
        continuation) — repaired char length grows by exactly 1;
      - everything else stays clean, and the THROWING validate_utf8
        runs live on this partition (a spurious throw fails the query).

    The corruption happens in BINARY space (encode -> byte splice ->
    CAST back to STRING, which reinterprets bytes without validation),
    the only way to hold an invalid UTF-8 string in Spark at all.

    Scale shape: row-local byte arithmetic, one aggregate — no shuffle
    beyond the final 1-row agg; this is the ingest-validation screen a
    100 TB landing zone runs per batch.
    """
    docs = t(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("id"), "text")
    d = (docs
         .withColumn("ol", F.expr("octet_length(text)"))
         .withColumn("cl", F.expr("length(text)"))
         .withColumn("cls", F.expr(
             "CASE WHEN ol = cl AND ol >= 1 AND id % 3 = 0 THEN 'sub' "
             "WHEN ol = cl AND ol >= 1 AND id % 3 = 1 AND id % 5 = 0 "
             "THEN 'trunc' ELSE 'clean' END"))
         .withColumn("p", F.expr(
             "CASE WHEN ol >= 1 THEN CAST(pmod(id, ol) AS INT) + 1 "
             "ELSE 1 END"))
         .withColumn("s", F.expr("""
             CASE cls
               WHEN 'sub' THEN CAST(concat(
                   substring(encode(text, 'UTF-8'), 1, p - 1),
                   unhex('FF'),
                   substring(encode(text, 'UTF-8'), p + 1, ol))
                 AS STRING)
               WHEN 'trunc' THEN CAST(concat(encode(text, 'UTF-8'),
                                             unhex('C2')) AS STRING)
               ELSE text
             END""")))
    return d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("cls") == "sub", 1).otherwise(0))
        .cast("long").alias("n_sub"),
        F.sum(F.when(F.col("cls") == "trunc", 1).otherwise(0))
        .cast("long").alias("n_trunc"),
        F.sum(F.expr("CASE WHEN is_valid_utf8(s) THEN 1 ELSE 0 END"))
        .cast("long").alias("n_valid"),
        F.sum(F.expr("CASE WHEN try_validate_utf8(s) IS NULL "
                     "THEN 1 ELSE 0 END"))
        .cast("long").alias("n_try_null"),
        F.sum(F.expr("CASE WHEN make_valid_utf8(s) = s "
                     "THEN 1 ELSE 0 END"))
        .cast("long").alias("n_identity"),
        F.sum(F.expr("length(make_valid_utf8(s))"))
        .cast("long").alias("repaired_chars"),
        F.sum(F.expr("CASE WHEN cls = 'clean' "
                     "THEN length(validate_utf8(s)) ELSE 0 END"))
        .cast("long").alias("validated_clean_chars"),
        F.sum("cl").cast("long").alias("orig_chars"))


Q105_SQL = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         strlen(text) AS ol, length(text) AS cl
  FROM documents
),
f AS (
  SELECT *,
         CASE WHEN ol = cl AND ol >= 1 AND id % 3 = 0 THEN 'sub'
              WHEN ol = cl AND ol >= 1 AND id % 3 = 1 AND id % 5 = 0
              THEN 'trunc' ELSE 'clean' END AS cls
  FROM d
)
-- pure arithmetic: no invalid string is ever built on this side
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cls = 'sub' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sub,
       CAST(SUM(CASE WHEN cls = 'trunc' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_trunc,
       CAST(SUM(CASE WHEN cls = 'clean' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       CAST(SUM(CASE WHEN cls != 'clean' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_try_null,
       CAST(SUM(CASE WHEN cls = 'clean' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_identity,
       CAST(SUM(cl) + SUM(CASE WHEN cls = 'trunc' THEN 1 ELSE 0 END)
            AS BIGINT) AS repaired_chars,
       CAST(SUM(CASE WHEN cls = 'clean' THEN cl ELSE 0 END) AS BIGINT)
         AS validated_clean_chars,
       CAST(SUM(cl) AS BIGINT) AS orig_chars
FROM f
"""

ROUND11B.update({
    "q105_validate_utf8_battery": (q105_validate_utf8_battery,
                                   Q105_SQL),
})
