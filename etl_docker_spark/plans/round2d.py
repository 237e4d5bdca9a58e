"""Round-2 fourth batch: product-analytics shapes (funnel, cohort
retention), corpus curation (boilerplate phrases, mixing weights), hybrid
lexical+vector retrieval (RRF), and a stream-static dimension join.

Why these: funnels/cohorts are the canonical sequential-event analytics the
reference's events pipeline would grow into; boilerplate detection and
domain mixing weights are standard pre-training curation passes (CCNet /
Gopher / DoReMi lineage) next to d15's repetition signals; reciprocal-rank
fusion is how production retrieval combines d21's BM25 with e-series vector
search; the stream-static broadcast join is the micro-batch form of the
reference's dimension-enrichment joins (Funciones_CotyData.py lookup maps).

Determinism discipline as everywhere else (plans/_util.py): integer/ppm
fixed-point scores, DECIMAL-exact sums, epoch-integer day arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dec, stream_state_partitions, t
from etl_docker_spark.plans.round2c import D21_SQL

# ---------------------------------------------------------------- q38

_FUNNEL_WINDOW_H = 6  # max hours between consecutive funnel stages


def q38_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase, each stage
    within 6 h of the previous one; per-stage distinct users + conversion
    from the previous stage in ppm.

    Scale shape: ONE shuffle. Events hash-partition by user_id once; the
    three stage timestamps are chained window MINs over that same
    partitioning (t1 = first view; t2 = first click in (t1, t1+6h];
    t3 = first purchase in (t2, t2+6h]), so stages 2 and 3 add no
    exchange. The final stage counts are a tiny global aggregate. The
    groupBy-and-rejoin formulation (what the SQL oracle uses) would scan
    and shuffle events three times.
    """
    ev = t(spark, sf, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    lim = F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w))
        .withColumn(
            "t2", F.min(F.when((F.col("event_type") == "click")
                               & (F.col("ts") > F.col("t1"))
                               & (F.col("ts") <= F.col("t1") + lim),
                               F.col("ts"))).over(w))
        .withColumn(
            "t3", F.min(F.when((F.col("event_type") == "purchase")
                               & (F.col("ts") > F.col("t2"))
                               & (F.col("ts") <= F.col("t2") + lim),
                               F.col("ts"))).over(w))
    )
    counts = staged.agg(
        F.count_distinct(F.when(F.col("t1").isNotNull(), F.col("user_id")))
        .alias("n1"),
        F.count_distinct(F.when(F.col("t2").isNotNull(), F.col("user_id")))
        .alias("n2"),
        F.count_distinct(F.when(F.col("t3").isNotNull(), F.col("user_id")))
        .alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, '1_view', n1, CAST(1000000 AS BIGINT),"
        " '2_click', n2, CASE WHEN n1 = 0 THEN 0 ELSE (1000000 * n2) div n1 END,"
        " '3_purchase', n3, CASE WHEN n2 = 0 THEN 0 ELSE (1000000 * n3) div n2 END)"
        " AS (stage, n_users, conv_from_prev_ppm)")


Q38_SQL = f"""
WITH t1 AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS v
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS c
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND t1.v IS NOT NULL
    AND e.ts > t1.v AND e.ts <= t1.v + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS p
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND e.ts > t2.c AND e.ts <= t2.c + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
),
n AS (
  SELECT (SELECT count(v) FROM t1) AS n1,
         (SELECT count(*) FROM t2) AS n2,
         (SELECT count(*) FROM t3) AS n3
)
SELECT '1_view' AS stage, n1 AS n_users,
       CAST(1000000 AS BIGINT) AS conv_from_prev_ppm FROM n
UNION ALL
SELECT '2_click', n2,
       CASE WHEN n1 = 0 THEN 0 ELSE (1000000 * n2) // n1 END FROM n
UNION ALL
SELECT '3_purchase', n3,
       CASE WHEN n2 = 0 THEN 0 ELSE (1000000 * n3) // n2 END FROM n
"""

# ---------------------------------------------------------------- q39

_DAY_US = 86_400_000_000


def q39_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Daily cohort retention: cohort = epoch-day of a user's first
    `signup` event; for each (cohort_day, day offset >= 0) the distinct
    users active that day and retention vs cohort size in ppm.

    Day indexes are integer epoch-microsecond divisions (identical in any
    engine — no week-truncation convention to disagree on). Scale shape:
    the firsts frame is one row per user (orders of magnitude smaller than
    events), so it BROADCASTS into the events scan; cohort sizes are a
    tiny aggregate broadcast again. Events shuffle once, for the
    (cohort_day, off) count-distinct.
    """
    ev = t(spark, sf, "events")
    day = (F.unix_micros(F.col("ts")) / F.lit(_DAY_US)).cast("long")
    # min of the day index == day index of min ts (floor-div is monotone)
    cohorts = (ev.filter(F.col("event_type") == "signup")
               .groupBy("user_id")
               .agg(F.min(day).alias("cohort_day")))
    sizes = (cohorts.groupBy("cohort_day")
             .agg(F.count("*").alias("cohort_users")))
    active = (
        ev.select("user_id", day.alias("d"))
        .join(F.broadcast(cohorts), "user_id")
        .filter(F.col("d") >= F.col("cohort_day"))
        .groupBy("cohort_day", (F.col("d") - F.col("cohort_day")).alias("off"))
        .agg(F.count_distinct("user_id").alias("n_active")))
    return (active.join(F.broadcast(sizes), "cohort_day")
            .select("cohort_day", "off", "n_active", "cohort_users",
                    F.expr("(1000000 * n_active) div cohort_users")
                    .alias("retention_ppm")))


Q39_SQL = f"""
WITH f AS (
  SELECT user_id,
         CAST(epoch_us(min(ts)) AS BIGINT) // {_DAY_US} AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, count(*) AS cohort_users FROM f GROUP BY cohort_day
),
active AS (
  SELECT f.cohort_day,
         CAST(epoch_us(e.ts) AS BIGINT) // {_DAY_US} - f.cohort_day AS off,
         count(DISTINCT e.user_id) AS n_active
  FROM events e JOIN f USING (user_id)
  WHERE CAST(epoch_us(e.ts) AS BIGINT) // {_DAY_US} >= f.cohort_day
  GROUP BY 1, 2
)
SELECT cohort_day, off, n_active, cohort_users,
       (1000000 * n_active) // cohort_users AS retention_ppm
FROM active JOIN sizes USING (cohort_day)
"""

# ---------------------------------------------------------------- d22

_BP_N = 4        # boilerplate n-gram order
_BP_MIN_DOCS = 3  # gram must appear in >= this many distinct docs


def d22_boilerplate_phrases(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate-phrase contamination per document: the fraction (ppm) of
    a doc's distinct 4-grams that are corpus boilerplate — a 4-gram
    occurring in >= 3 distinct documents. Docs with no boilerplate are
    omitted (they carry no signal and at corpus scale would dominate rows).

    The CCNet/C4-style boilerplate pass (nav bars, cookie banners, license
    headers repeat verbatim across pages). Scale shape: one corpus pass
    emits distinct (doc, gram) rows via the codegen shingle_rows path (the
    distinct and the per-doc gram counts are exchange-free under its id
    partitioning); the doc-frequency aggregate shuffles gram-width rows
    once; the surviving boilerplate set is tiny by construction
    (frequency >= 3 across documents) and BROADCASTS back against the
    per-doc gram rows, so the corpus is never shuffled twice.
    """
    from etl_docker_spark.llm.dedup import shingle_rows

    docs = t(spark, sf, "documents")
    # one corpus pass: the distinct (doc, gram) frame is materialized once
    # (localCheckpoint preserves its doc-hash partitioning) and feeds BOTH
    # consumers — the doc-frequency aggregate and the hits join
    sh = (shingle_rows(docs, "doc_id", "text", _BP_N)
          .withColumnRenamed("doc", "doc_id")
          .distinct().localCheckpoint())
    w = Window.partitionBy("doc_id")
    grams = sh.select(
        "doc_id", F.count("*").over(w).cast("long").alias("n_grams"),
        F.col("s").alias("g"))
    bp = (grams.groupBy("g").agg(F.count("*").alias("df"))
          .filter(F.col("df") >= _BP_MIN_DOCS)
          .select("g"))
    hits = (grams.join(F.broadcast(bp), "g")
            .groupBy("doc_id", "n_grams")
            .agg(F.count("*").alias("n_boilerplate")))
    return hits.select(
        "doc_id", "n_boilerplate", "n_grams",
        F.expr("(1000000 * n_boilerplate) div n_grams")
        .alias("boilerplate_ppm"))


D22_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {_BP_N - 1}, 1)),
             i -> array_to_string(tk[i:i+{_BP_N - 1}], ' '))) AS sh
  FROM toks
),
grams AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams, unnest(sh) AS g FROM sh
),
bp AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= {_BP_MIN_DOCS}
),
hits AS (
  SELECT doc_id, n_grams, count(*) AS n_boilerplate
  FROM grams JOIN bp USING (g)
  GROUP BY doc_id, n_grams
)
SELECT doc_id, n_boilerplate, n_grams,
       (1000000 * n_boilerplate) // n_grams AS boilerplate_ppm
FROM hits
"""

# ---------------------------------------------------------------- d23

_N_LANGS = 5  # uniform target share = 1/5 per language


def d23_mixing_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Language-mixing sampling weights per (lang, source): token counts,
    each language's realized share of the corpus, and the up/down-sampling
    weight (ppm) that moves the mix to a uniform 1/len(langs) target —
    the DoReMi/Pile-style domain-reweighting pass before training.

    weight_ppm = 1e6 * total_tokens div (n_langs * lang_tokens): >1e6
    up-samples under-represented languages. Scale shape: token counting is
    a map-side `size(split(...))` (no explode — counts only), one shuffle
    on (lang, source); the per-lang and corpus totals are tiny aggregates
    of THAT aggregate, broadcast back. The corpus is scanned once.
    """
    docs = t(spark, sf, "documents")
    per = (docs.select(
        "lang", "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("tok"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("tokens")))
    lang_tot = (per.groupBy("lang")
                .agg(F.sum("tokens").alias("lang_tokens")))
    total = per.agg(F.sum("tokens").alias("total_tokens"))
    return (per.join(F.broadcast(lang_tot), "lang")
            .crossJoin(F.broadcast(total))
            .select(
                "lang", "source", "n_docs", "tokens",
                F.expr("(1000000 * lang_tokens) div total_tokens")
                .alias("lang_share_ppm"),
                F.expr(f"(1000000 * total_tokens) div ({_N_LANGS} * lang_tokens)")
                .alias("weight_ppm")))


D23_SQL = f"""
WITH per AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY lang, source
),
lt AS (SELECT lang, SUM(tokens) AS lang_tokens FROM per GROUP BY lang),
tot AS (SELECT SUM(tokens) AS total_tokens FROM per)
SELECT lang, source, n_docs, tokens,
       CAST((1000000 * lang_tokens) // total_tokens AS BIGINT)
         AS lang_share_ppm,
       CAST((1000000 * total_tokens) // ({_N_LANGS} * lang_tokens) AS BIGINT)
         AS weight_ppm
FROM per JOIN lt USING (lang), tot
"""

# ---------------------------------------------------------------- e08

_RRF_K = 60     # standard RRF dampening constant
_RRF_TOP = 10   # fused results returned
_E08_QUERY_VEC = 0  # query = embedding of vec_id 0 (joins doc space: ids align)


def e08_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of d21's BM25 top-10 with
    the cosine top-10 against a fixed query vector (vec_id 0), the
    standard lexical+vector ensemble (rrf = sum 1/(60+rank), here in exact
    ppm integer arithmetic: 1e6 div (60+rank), missing list contributes 0).

    Scale shape: both input rankings are top-k's of distributed scoring
    passes (BM25: one corpus pass; cosine: query broadcast against the
    embedding scan) — the fusion itself is a full-outer join of two
    k-row frames, trivially a broadcast. doc_id/vec_id share the id space
    in the corpus (TESTDATA), which is what makes the fusion meaningful.
    """
    from etl_docker_spark.llm.similarity import cosine_expr
    from etl_docker_spark.plans.round2c import d21_bm25_search

    bm = (d21_bm25_search(spark, sf)
          .select(F.col("doc_id"), F.col("rank").alias("bm25_rank")))

    emb = t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == _E08_QUERY_VEC).select(
        F.col("embedding").alias("qv"))
    cos = (emb.crossJoin(F.broadcast(qv))
           .select(F.col("vec_id").alias("doc_id"),
                   F.round(cosine_expr(F.col("embedding"), F.col("qv")), 8)
                   .alias("cosine")))
    # Distributed top-k (TakeOrderedAndProject), then rank the k-row
    # result via the windowless bounded-frame triangle (operators/
    # rank.py) — the earlier global row_number() over EVERY scored doc
    # was a single-partition window over a corpus-sized frame.
    from etl_docker_spark.operators.rank import rank_bounded

    cos_top = (rank_bounded(cos.orderBy(F.desc("cosine"), F.asc("doc_id"))
                            .limit(_RRF_TOP),
                            [("cosine", True), ("doc_id", False)],
                            "cos_rank")
               .select("doc_id", "cos_rank"))

    fused = (
        bm.join(cos_top, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("cos_rank", F.lit(0)).alias("cos_rank"),
            (F.when(F.col("bm25_rank").isNotNull(),
                    F.expr(f"1000000 div ({_RRF_K} + bm25_rank)"))
             .otherwise(F.lit(0))
             + F.when(F.col("cos_rank").isNotNull(),
                      F.expr(f"1000000 div ({_RRF_K} + cos_rank)"))
             .otherwise(F.lit(0))).alias("rrf_ppm")))
    # fused is the outer join of two <= TOP-row frames (bounded by
    # construction, though not by a syntactic LIMIT) — rank it the same
    # windowless way
    return (rank_bounded(fused, [("rrf_ppm", True), ("doc_id", False)],
                         "fused_rank")
            .filter(F.col("fused_rank") <= _RRF_TOP))


_E08_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            "(x, y) -> x + y)")
E08_SQL = f"""
WITH bm AS (
  SELECT doc_id, rank AS bm25_rank FROM ({D21_SQL})
),
qv AS (
  SELECT embedding AS q FROM embeddings WHERE vec_id = {_E08_QUERY_VEC}
),
cos AS (
  SELECT vec_id AS doc_id,
         round({_E08_DOT.format(a='embedding', b='q')}
               / sqrt({_E08_DOT.format(a='embedding', b='embedding')}
                      * {_E08_DOT.format(a='q', b='q')}), 8) AS cosine
  FROM embeddings, qv
),
ct AS (
  SELECT doc_id, cos_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cosine DESC, doc_id) AS cos_rank
    FROM cos
  ) WHERE cos_rank <= {_RRF_TOP}
),
fused AS (
  SELECT COALESCE(bm.doc_id, ct.doc_id) AS doc_id,
         COALESCE(bm25_rank, 0) AS bm25_rank,
         COALESCE(cos_rank, 0) AS cos_rank,
         (CASE WHEN bm25_rank IS NULL THEN 0
               ELSE 1000000 // ({_RRF_K} + bm25_rank) END
          + CASE WHEN cos_rank IS NULL THEN 0
                 ELSE 1000000 // ({_RRF_K} + cos_rank) END) AS rrf_ppm
  FROM bm FULL OUTER JOIN ct ON bm.doc_id = ct.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, rrf_ppm,
       CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS BIGINT)
         AS fused_rank
FROM fused
QUALIFY fused_rank <= {_RRF_TOP}
"""

# ---------------------------------------------------------------- s08


def s08_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static dimension enrichment: the events STREAM broadcast-
    joined per micro-batch to the static customer dimension (user_id + 1
    maps into c_custkey), then a watermarked daily tumbling aggregate per
    market segment — the Structured-Streaming form of the reference's
    lookup-map joins (Funciones_CotyData.py:15-326). The static side is
    re-resolvable per batch (live dim updates); broadcast keeps the stream
    side shuffle-free before the windowed aggregation. Oracle = the batch
    answer (exactly-once check, as s01..s07).
    """
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)
    from etl_docker_spark.streaming import tumbling_aggregate

    dim = (t(spark, sf, "customer")
           .select((F.col("c_custkey") - 1).alias("user_id"),
                   F.col("c_mktsegment").alias("segment")))
    stream = _events_stream(spark, sf).join(F.broadcast(dim), "user_id")
    agg = tumbling_aggregate(
        stream, "1 day",
        {"n_events": F.count("*"),
         "total_value": F.sum(dec("value")).cast("double")},
        keys=["segment"], watermark="1 minute")
    name = f"s08_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S08_SQL = f"""
WITH enriched AS (
  SELECT CAST(epoch_us(e.ts) AS BIGINT) // {_DAY_US} AS day_idx,
         c.c_mktsegment AS segment, e.value
  FROM events e JOIN customer c ON e.user_id + 1 = c.c_custkey
)
SELECT make_timestamp(day_idx * {_DAY_US}) AS window_start,
       make_timestamp((day_idx + 1) * {_DAY_US}) AS window_end,
       segment,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM enriched
GROUP BY day_idx, segment
"""


ROUND2D = {
    "q38_funnel_conversion": (q38_funnel_conversion, Q38_SQL),
    "q39_cohort_retention": (q39_cohort_retention, Q39_SQL),
    "d22_boilerplate_phrases": (d22_boilerplate_phrases, D22_SQL),
    "d23_mixing_weights": (d23_mixing_weights, D23_SQL),
    "e08_hybrid_rrf": (e08_hybrid_rrf, E08_SQL),
    "s08_stream_static_join": (s08_stream_static_join, S08_SQL),
}
