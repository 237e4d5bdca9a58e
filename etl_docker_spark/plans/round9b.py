"""Round-8 continuation surface (registered same-session as the round-9
staged four): the remaining un-queried live primitives from the round-8
environment probe, each turned into an oracle-gated query.

- d66: `approx_top_k` heavy hitters — gated via the structural tie dodge
  the round-8 probe said was required (the k-boundary tie-break is
  hash-order, not lexicographic: drop the whole boundary stratum).
- d67: `hll_sketch_agg` / `hll_union_agg` — gated in the coupon-exact
  phase via d64's bounded-domain trick (probe: lgK=16 estimates are
  exact through 8192 distinct; promotion drift starts at 4096 for
  lgK=15, 3000 for lgK=14).
- d68: model drift gate — same-doc score delta between the d60 full
  model and the d63 split model (the round-8 NOTES' round-9 item 3).
- q100: UNICODE_CI_AI accent+case-insensitive collation (q97 covered
  UTF8_LCASE; this needs non-ASCII data, derived deterministically
  in-query from real columns so the corpus stays driver-generated).

Reference parity: the reference has no sketch/classifier tier; these are
the beyond-reference LLM-pipeline operators the brief names first-class.
Its case-insensitive matching idiom (lower()-everywhere, e.g.
CotyData_IPN.py's string normalizations) is what q97/q100 re-express as
engine-level collations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t
from etl_docker_spark.plans.round8 import (_D64_DOMAIN,
                                            _TOK_BUCKET_DUCK,
                                            _TOK_BUCKET_SPARK)

ROUND9B: dict = {}

# ---------------------------------------------------------------- d66

_D66_K = 40
# > _D64_DOMAIN (3000), so the sketch tracks every bucket exactly at ANY
# corpus scale and the returned counts are exact — the same bounded-domain
# argument as d64/d67 (see those docstrings).
_D66_MAXTRACK = 8192


def d66_heavy_hitter_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language heavy-hitter token buckets via `approx_top_k` (the
    round-8 probe find left un-queried because its k-boundary tie-break
    is hash-order): one sketch per language over the bounded token-hash
    domain, then the STRUCTURAL TIE DODGE — drop the entire boundary
    stratum (every item whose count equals the minimum returned count),
    leaving exactly the items with count STRICTLY greater than the k-th
    largest count. That set is tie-order-independent, so the oracle can
    reproduce it from plain group-by counts.

    Scale shape: approx_top_k is a map-side-combinable aggregate state
    (one fixed-size sketch per language, merged associatively across
    1000 executors); the explode + boundary filter runs over <= 5*k
    rows. At 100 TB this is the correct heavy-hitter plan — no global
    per-token count materializes, only per-partition sketch states.
    The dodge generalizes: any approx_top_k consumer that needs a
    DETERMINISTIC set (a blocklist build, a stop-token table) should
    publish the strict-majority stratum, not the raw k rows.
    """
    docs = t(spark, sf, "documents")
    toks = docs.select("lang",
                       F.explode(F.split("text", " ")).alias("tok"))
    sk = (toks.select("lang", F.expr(_TOK_BUCKET_SPARK).alias("b"))
          .groupBy("lang")
          .agg(F.expr(f"approx_top_k(b, {_D66_K}, {_D66_MAXTRACK})")
               .alias("tk")))
    bounded = sk.select(
        "lang",
        F.expr("array_min(transform(tk, x -> x.count))").alias("min_cnt"),
        F.explode("tk").alias("e"))
    return (bounded.filter(F.col("e.count") > F.col("min_cnt"))
            .select("lang",
                    F.col("e.item").cast("long").alias("bucket"),
                    F.col("e.count").cast("long").alias("cnt"))
            .orderBy("lang", "bucket"))


D66_SQL = f"""
WITH tb AS (
  SELECT lang, {_TOK_BUCKET_DUCK} AS b
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
),
cnt AS (
  SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tb GROUP BY lang, b
),
th AS (
  -- the k-th largest count per language (multiset order; tie-break
  -- inside the top-k is irrelevant because only MIN(cnt) is read)
  SELECT lang, MIN(cnt) AS thresh FROM (
    SELECT lang, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC) AS rn
    FROM cnt
  ) WHERE rn <= {_D66_K}
  GROUP BY lang
)
SELECT c.lang, c.b AS bucket, c.cnt
FROM cnt c JOIN th USING (lang)
WHERE c.cnt > th.thresh
ORDER BY lang, bucket
"""

ROUND9B.update({
    "d66_heavy_hitter_buckets": (d66_heavy_hitter_buckets, D66_SQL),
})

# ---------------------------------------------------------------- d67

# DataSketches HLL stays in its coupon (LIST/SET) phase — where the
# estimate is EXACT — until ~2^(lgK-2) distinct values; probed in this
# build: lgK=16 exact through 8192, lgK=15 drifts at 4096, lgK=14 at
# 3000. The 3000-bucket domain is safely inside lgK=16's exact phase,
# for every per-lang sketch AND every union (unions of coupon sets stay
# coupon sets at <= 3000 distinct), so the oracle pins every estimate
# as a plain COUNT(DISTINCT ...).
_D67_LGK = 16


def d67_hll_lang_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-coverage curve via NATIVE Apache DataSketches HLL
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate — the round-8
    probe find left un-queried): one HLL sketch per language over the
    bounded token-hash domain, then each language's OWN bucket
    cardinality, the CUMULATIVE cardinality as corpora are added in
    language order (sketch set-algebra over a 5x5 triangle of states —
    no data re-scan per prefix), and the global total.

    This is the curation-planning question "how much new vocabulary
    does each corpus add?" answered the 100-TB way: sketch each corpus
    once (map-side-combinable state), keep the 5 fixed-size states, and
    every prefix/union question — including any FUTURE ordering of the
    same corpora — is answered from states alone. HLL differs from
    d64's theta exactly where it should: union-only algebra but a
    fraction of theta's state size; d64 remains the tier for
    intersection/difference questions.

    Gate exactness: see _D67_LGK. The triangle join is constant-size
    (5x5 sketch states) — allowlisted BNLJ like d64's pair join.
    """
    docs = t(spark, sf, "documents")
    toks = docs.select("lang",
                       F.explode(F.split("text", " ")).alias("tok"))
    sk = (toks.select("lang", F.expr(_TOK_BUCKET_SPARK).alias("b"))
          .groupBy("lang")
          .agg(F.expr(f"hll_sketch_agg(b, {_D67_LGK})").alias("sk")))
    own = sk.select("lang",
                    F.expr("hll_sketch_estimate(sk)").cast("long")
                    .alias("own_buckets"))
    a = sk.select(F.col("lang").alias("lang_a"))
    b = sk.select(F.col("lang").alias("lang_b"), F.col("sk").alias("sk_b"))
    cum = (a.join(F.broadcast(b), F.col("lang_b") <= F.col("lang_a"))
           .groupBy("lang_a")
           .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk_b, true))")
                .cast("long").alias("cum_buckets")))
    total = sk.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, true))")
                   .cast("long").alias("total_buckets"))
    return (own.join(cum, own.lang == cum.lang_a)
            .crossJoin(F.broadcast(total))
            .select("lang", "own_buckets", "cum_buckets", "total_buckets",
                    F.expr("cum_buckets * 1000000 DIV total_buckets")
                    .cast("long").alias("cum_ppm"))
            .orderBy("lang"))


D67_SQL = f"""
WITH tb AS (
  SELECT DISTINCT lang, {_TOK_BUCKET_DUCK} AS b
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
),
langs AS (SELECT DISTINCT lang FROM tb),
own AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS own_buckets
  FROM tb GROUP BY lang
),
cum AS (
  SELECT l.lang, CAST(COUNT(DISTINCT t.b) AS BIGINT) AS cum_buckets
  FROM langs l JOIN tb t ON t.lang <= l.lang
  GROUP BY l.lang
),
tot AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS total_buckets FROM tb)
SELECT o.lang, o.own_buckets, c.cum_buckets, tot.total_buckets,
       CAST(c.cum_buckets * 1000000 // tot.total_buckets AS BIGINT)
         AS cum_ppm
FROM own o JOIN cum c USING (lang), tot
ORDER BY lang
"""

ROUND9B.update({
    "d67_hll_lang_coverage": (d67_hll_lang_coverage, D67_SQL),
})

# ---------------------------------------------------------------- d68


def d68_model_score_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Model-stability gate: the SAME-DOCUMENT score delta between the
    d60 full-corpus model and the d63 train-split model, rolled up per
    split (the round-8 NOTES' drift-metric item). Two models trained on
    nested data answering differently about the same document is the
    production early-warning for training-set sensitivity: a large
    holdout-side delta or flip rate means single-split retrains move
    the curation knife; the train-side delta isolates pure
    20%-data-removal sensitivity (both models saw those docs).

    Output per split: doc count, keep/drop FLIPS between the two
    models, signed total drift (direction: does removing 20% of
    training data make scores optimistic or pessimistic), mean and max
    absolute drift in ppm. Integer arithmetic end to end, so the
    oracle retrains BOTH models from scratch in SQL and reproduces
    every number bit-for-bit.

    Scale shape: both scoring passes are the d59/d60 broadcast-join
    shape over one shared feature explode would be ideal — here the
    full-model side reads the MEMOIZED d60 scores table (score once,
    consume everywhere; this is its third consumer after d60/d61) so
    only the split model re-scores, and the per-doc join of the two
    score tables shuffles on doc_id once.
    """
    from etl_docker_spark.plans.round7 import (classifier_occ_frame,
                                               d60_scores_frame)
    from etl_docker_spark.plans.round8 import d63_weights_frame

    full = d60_scores_frame(spark, sf).select(
        "doc_id", F.col("score_ppm").alias("full_ppm"),
        F.col("keep_pred").alias("full_keep"))
    weights = d63_weights_frame(spark, sf)
    occ = classifier_occ_frame(spark, sf).select(
        "doc_id", "split", "bucket")
    scored = (occ.join(F.broadcast(weights), "bucket", "left")
              .groupBy("doc_id", "split")
              .agg(F.count("*").cast("long").alias("n_feats"),
                   F.sum(F.coalesce(F.col("w_ppm"), F.lit(0)))
                   .cast("long").alias("sum_ppm")))
    split_scores = scored.select(
        "doc_id", "split", F.expr("sum_ppm DIV n_feats").alias("split_ppm"))
    per = (full.join(split_scores, "doc_id")
           .select("split",
                   (F.col("full_ppm") - F.col("split_ppm")).alias("delta"),
                   (F.col("full_keep") != (F.col("split_ppm") > 0))
                   .cast("long").alias("flip")))
    return (per.groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("flip").cast("long").alias("n_flipped"),
                 F.sum("delta").cast("long").alias("sum_delta_ppm"),
                 F.expr("sum(abs(delta)) DIV count(*)").cast("long")
                 .alias("mean_abs_delta_ppm"),
                 F.max(F.abs(F.col("delta"))).cast("long")
                 .alias("max_abs_delta_ppm"))
            .orderBy("split"))


def _d68_sql() -> str:
    from etl_docker_spark.plans.round2f import _MIN_TOKENS
    from etl_docker_spark.plans.round6 import _D58_BUCKETS
    from etl_docker_spark.plans.round7 import _D60_FEATS_DUCK, _D60_SCALE
    from etl_docker_spark.plans.round8 import _D63_TRAIN_PCT
    return rf"""
WITH labeled AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
           AS n_tokens,
         CASE WHEN CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
                        AS BIGINT) < {_MIN_TOKENS} THEN 0
              WHEN 2 * CAST(len(list_distinct(
                       regexp_extract_all(text, '\w+|[^\w\s]')))
                       AS BIGINT)
                   < CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
                          AS BIGINT) THEN 0
              ELSE 1 END AS y0,
         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) % 100
                   < {_D63_TRAIN_PCT}
              THEN 'train' ELSE 'holdout' END AS split,
         {_D60_FEATS_DUCK} AS feats
  FROM documents
),
lab AS (
  SELECT doc_id, split, feats,
         CASE WHEN y0 = 0 THEN 0
              WHEN row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) > 1 THEN 0
              ELSE 1 END AS y
  FROM labeled
),
occ AS (
  SELECT doc_id, split, y,
         CAST('0x' || substring(md5(unnest(feats)), 1, 8) AS BIGINT)
           % {_D58_BUCKETS} AS bucket
  FROM lab
),
cfull AS (
  SELECT bucket, CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM occ GROUP BY bucket
),
pfull AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS g1, CAST(SUM(n0) AS BIGINT) AS g0
  FROM cfull
),
wfull AS (
  SELECT bucket,
         CAST((n1 - n0) * {_D60_SCALE} // (n1 + n0)
              - (g1 - g0) * {_D60_SCALE} // (g1 + g0) AS BIGINT) AS w
  FROM cfull, pfull
),
ctr AS (
  SELECT bucket, CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM occ WHERE split = 'train' GROUP BY bucket
),
ptr AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS g1, CAST(SUM(n0) AS BIGINT) AS g0
  FROM ctr
),
wtr AS (
  SELECT bucket,
         CAST((n1 - n0) * {_D60_SCALE} // (n1 + n0)
              - (g1 - g0) * {_D60_SCALE} // (g1 + g0) AS BIGINT) AS w
  FROM ctr, ptr
),
scored AS (
  SELECT o.doc_id, any_value(o.split) AS split,
         CAST(COUNT(*) AS BIGINT) AS nf,
         CAST(SUM(wf.w) AS BIGINT) AS sfull,
         CAST(SUM(COALESCE(wt.w, 0)) AS BIGINT) AS ssplit
  FROM occ o
  JOIN wfull wf USING (bucket)
  LEFT JOIN wtr wt USING (bucket)
  GROUP BY o.doc_id
),
per AS (
  SELECT split, (sfull // nf) AS fp, (ssplit // nf) AS sp FROM scored
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN (fp > 0) != (sp > 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flipped,
       CAST(SUM(fp - sp) AS BIGINT) AS sum_delta_ppm,
       CAST(SUM(abs(fp - sp)) // COUNT(*) AS BIGINT)
         AS mean_abs_delta_ppm,
       CAST(MAX(abs(fp - sp)) AS BIGINT) AS max_abs_delta_ppm
FROM per GROUP BY split ORDER BY split
"""


ROUND9B.update({
    "d68_model_score_drift": (d68_model_score_drift, _d68_sql()),
})

# --------------------------------------------------------------- q100


def q100_accent_collation_battery(spark: SparkSession,
                                  sf: str) -> DataFrame:
    """UNICODE_CI_AI — the accent- AND case-insensitive collation (q97
    covered case-only UTF8_LCASE; the round-8 probe listed CI_AI as
    live but un-queried for want of non-ASCII data). Non-ASCII variants
    are derived DETERMINISTICALLY from the real corpus: per customer
    key mod 3, the market segment is accent-mangled
    (translate lower-vowels -> áéíóú), upper-cased, or left raw — so
    every segment fans out into case AND accent variants that only the
    collation can re-unify.

    Load-bearing legs: (1) grouping counts — the canonical group-by
    must merge all variants; (2) n_ci_distinct == 1 per group pins that
    CI_AI actually equates the accent variants ON SPark's side (the
    oracle's strip_accents grouping makes it 1 by construction — the
    asymmetry is the point: if CI_AI failed, Spark reads > 1);
    (3) collated EQUALITY against a literal spelled with the opposite
    case and our accent map ('BÚÍLDÍNG'). Outputs are canonicalized by
    reversing the in-query accent map (closed by construction) and
    collated back to UTF8_BINARY so the cross-engine schema compare
    stays exact; the oracle canonicalizes via strip_accents+lower.

    Scale shape: like q97 — collation comparisons are expression-level
    (ICU collator inside codegen); the plan is one hash aggregate on
    the canonical key, no extra pass to materialize lower()/unaccented
    copies.
    """
    cust = t(spark, sf, "customer")
    mangled = F.expr(
        "CASE CAST(c_custkey % 3 AS INT) "
        "WHEN 0 THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú') "
        "WHEN 1 THEN upper(c_mktsegment) "
        "ELSE lower(c_mktsegment) END")
    staged = cust.select(
        mangled.alias("raw"),
        F.col("c_acctbal").cast("decimal(12,4)").alias("bal"))
    ci = "collate(raw, 'UNICODE_CI_AI')"
    canon = (f"collate(lower(translate(raw, 'áéíóú', 'aeiou')), "
             f"'UTF8_BINARY')")
    return (staged.groupBy(F.expr(canon).alias("segment"))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.count_distinct("raw").cast("long").alias("n_variants"),
                 F.expr(f"count(DISTINCT {ci})").cast("long")
                 .alias("n_ci_distinct"),
                 F.sum(F.when(F.expr(f"{ci} = 'BÚÍLDÍNG'"), 1).otherwise(0))
                 .cast("long").alias("n_eq_building"),
                 F.sum("bal").cast("double").alias("sum_bal"))
            .orderBy("segment"))


Q100_SQL = """
WITH staged AS (
  SELECT CASE CAST(c_custkey % 3 AS INT)
           WHEN 0 THEN translate(lower(c_mktsegment), 'aeiou', 'áéíóú')
           WHEN 1 THEN upper(c_mktsegment)
           ELSE lower(c_mktsegment) END AS raw,
         CAST(c_acctbal AS DECIMAL(12,4)) AS bal
  FROM customer
)
SELECT lower(strip_accents(raw)) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_variants,
       CAST(COUNT(DISTINCT lower(strip_accents(raw))) AS BIGINT)
         AS n_ci_distinct,
       CAST(SUM(CASE WHEN lower(strip_accents(raw)) =
                          lower(strip_accents('BÚÍLDÍNG'))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_building,
       CAST(CAST(SUM(bal) AS VARCHAR) AS DOUBLE) AS sum_bal
FROM staged
GROUP BY lower(strip_accents(raw))
ORDER BY segment
"""

ROUND9B.update({
    "q100_accent_collation_battery": (q100_accent_collation_battery,
                                      Q100_SQL),
})

# ---------------------------------------------------------------- s32


def s32_stream_hll_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING distinct-cardinality via native HLL sketch aggregation —
    the streaming leg of the d64/d67 sketch family: per (event-time day,
    event_type), the event count and the distinct user-bucket count,
    where the cardinality state is an `hll_sketch_agg` sketch, not a
    per-key exact-distinct state store.

    This is THE 100-TB streaming-distinct design: an exact streaming
    COUNT(DISTINCT) would carry every seen key in the state store
    (state grows with cardinality, the classic streaming OOM); the HLL
    state is a few KB per group regardless of how many distinct values
    pass, merges associatively across micro-batches and shuffle
    partitions, and the estimate is read once per emitted row. Gate
    exactness: user ids fold into d64's bounded 3000-bucket domain, so
    every sketch stays in its coupon-exact phase (_D67_LGK = 16,
    exact through 8192 — tests/test_round9.py pins the boundary) and
    the oracle pins estimates as plain COUNT(DISTINCT ...). At a real
    100 TB feed you would drop the bucketing and accept the ±0.8%
    HLL error — the plan does not change, only the exactness argument.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    stream = _events_stream(spark, sf)
    bucket = F.expr(
        f"pmod(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
        f"16, 10) AS BIGINT), {_D64_DOMAIN})")
    agg = (stream.select("ts", "event_type", bucket.alias("b"))
           .withWatermark("ts", "1 minute")
           .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.expr(f"hll_sketch_estimate(hll_sketch_agg(b, {_D67_LGK}))")
                .cast("long").alias("n_user_buckets"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n_events", "n_user_buckets"))
    name = f"s32_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S32_SQL = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
         AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT
              CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % {_D64_DOMAIN}) AS BIGINT)
         AS n_user_buckets
FROM events
GROUP BY 1, 2, 3
"""

ROUND9B.update({
    "s32_stream_hll_cardinality": (s32_stream_hll_cardinality, S32_SQL),
})

# ---------------------------------------------------------------- d69


def d69_bitmap_exact_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct counting via the native bitmap aggregate family
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_or_agg / bitmap_count — a NEW probe find this session; the
    round-8 probe predates it). Per event type: exact distinct users
    from segment bitmaps, plus the global exact distinct-user count
    re-aggregated from the SAME bitmap states — no second scan.

    This completes the cardinality tier ladder: d64 theta (set algebra,
    approximate beyond exact mode), d67/s32 HLL (union-only, tiny
    state), d69 bitmaps (EXACT, state = 1 bit per possible id inside
    fixed 32 KB segments — the right tier when ids are dense integers,
    e.g. user/doc ids). Unlike the sketch tiers, no bounded-domain
    trick is needed for the gate: bitmaps are exact by construction at
    any scale, so the oracle is a plain COUNT(DISTINCT user_id).

    Scale shape: two cascaded aggregates — (type, segment)-keyed
    bitmap build with map-side partial OR-merging, then a per-type
    rollup summing per-segment popcounts, re-using the level-1 states
    for the global union (grouped by segment — NOT a single-row
    collapse; the global popcount is a sum over segment popcounts, so
    state per task stays one 32 KB segment regardless of id range).
    A 10^9-dense-id corpus is ~30k segments x 32 KB = manageable state
    fanned across executors, where exact distinct via shuffle-distinct
    would move every (type, id) pair.
    """
    ev = t(spark, sf, "events")
    lvl1 = (ev.groupBy("event_type",
                       F.expr("bitmap_bucket_number(user_id)").alias("seg"))
            .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
                 .alias("bm"),
                 F.count("*").cast("long").alias("n")))
    per_type = (lvl1.groupBy("event_type")
                .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long")
                     .alias("n_users"),
                     F.sum("n").cast("long").alias("n_events")))
    total = (lvl1.groupBy("seg")
             .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
             .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long")
                  .alias("total_users")))
    return (per_type.crossJoin(F.broadcast(total))
            .select("event_type", "n_events", "n_users", "total_users",
                    F.expr("n_users * 1000000 DIV total_users")
                    .cast("long").alias("share_ppm"))
            .orderBy("event_type"))


D69_SQL = """
WITH per_type AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users
  FROM events
)
SELECT event_type, n_events, n_users, total_users,
       CAST(n_users * 1000000 // total_users AS BIGINT) AS share_ppm
FROM per_type, tot
ORDER BY event_type
"""

ROUND9B.update({
    "d69_bitmap_exact_distinct": (d69_bitmap_exact_distinct, D69_SQL),
})
