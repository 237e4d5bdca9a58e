"""Round-7 queries: the trained-classifier lifecycle (d60) — the
round-6 verdict's item 4: d58/d59 ran INFERENCE with formula weights;
this trains the weight table from the corpus's own curation verdicts,
persists it through the index cache, and gates the full
train -> persist -> serve loop against an oracle that recomputes the
same training arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t
from etl_docker_spark.plans.round2f import _MIN_TOKENS as _ORACLE_MIN_TOKENS
from etl_docker_spark.plans.round6 import _D58_BUCKETS, feats_sql

ROUND7: dict = {}

# ---------------------------------------------------------------- d60

_D60_SCALE = 1_000_000  # fixed point: ppm of per-bucket label polarity

_BUCKET_SPARK = (f"pmod(CAST(conv(substring(md5(f), 1, 8), 16, 10) "
                 f"AS BIGINT), {_D58_BUCKETS})")


def _labeled_docs(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, lang, text, verdict, y) — d26's curation verdict as the
    training label (y = 1 for keep, 0 for any drop reason), computed
    inline on the corpus frame so the feature explode can carry the
    label without a second corpus-sized join."""
    from etl_docker_spark.plans.round2f import _MIN_TOKENS
    from pyspark.sql import Window

    from etl_docker_spark.llm.text import token_count, tokens_of

    docs = t(spark, sf, "documents")
    toks = tokens_of(F.col("text"))
    wdig = Window.partitionBy("digest").orderBy("doc_id")
    staged = (docs.select(
        "doc_id", "lang", "text",
        token_count(F.col("text")).alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.md5(F.col("text").cast("binary")).alias("digest"))
        .withColumn("dup_rn", F.row_number().over(wdig)))
    verdict = (F.when(F.col("n_tokens") < _MIN_TOKENS, "too_short")
               .when(2 * F.col("n_unique") < F.col("n_tokens"),
                     "low_diversity")
               .when(F.col("dup_rn") > 1, "exact_dup")
               .otherwise("keep"))
    return staged.select(
        "doc_id", "lang", "text", verdict.alias("verdict"),
        (verdict == "keep").cast("long").alias("y"))


def classifier_occ_frame(spark: SparkSession, sf: str) -> DataFrame:
    """THE shared feature pass of the trained-classifier family:
    (doc_id, lang, verdict, y, split, n_tokens, bucket) — one row per
    hashed unigram/bigram feature occurrence, memoized through the
    index cache.

    Before round 11 every consumer re-ran the identical corpus pass
    (documents scan -> digest window -> feats_sql explode -> md5 bucket)
    for itself: d60 weight training, d60 scoring, d63 split training,
    d63 holdout scoring, d65 calibration scoring, d68 drift scoring —
    six explode+md5 passes per cold session. This frame runs the pass
    ONCE and every consumer reduces it (filter/groupBy/broadcast-join),
    which is the guide-§8 shape: the expensive corpus-wide work happens
    exactly once, every decision derives from the small proxy table.
    All downstream arithmetic is unchanged — same features, same md5
    buckets, same labels/splits — so every gated output is bit-identical
    (the oracles retrain from scratch in SQL either way).

    Scale: row count = total feature occurrences (~2 x corpus tokens);
    at 100 TB this is the scores/feature table a production curation
    pipeline materializes once per corpus snapshot anyway.
    """
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.llm.text import token_count

    def build() -> DataFrame:
        # function-level import: round8 imports round7 at module level,
        # so the split formula (owned by round8) must load lazily here
        from etl_docker_spark.plans.round8 import _d63_split

        # Two-step select: per-DOC scalars (token_count's regexp scan,
        # the split md5) project BEFORE the explode select. In a single
        # select-with-generator they land in the projection evaluated
        # per exploded occurrence — ~107x re-evaluation per feature row,
        # measured 12.4s -> 4.7s at sf0.1 for this frame.
        pre = (_labeled_docs(spark, sf)
               .withColumn("tk", F.split(F.col("text"), " "))
               .select(
                   "doc_id", "lang", "verdict", "y",
                   _d63_split().alias("split"),
                   token_count(F.col("text")).alias("n_tokens"),
                   # tokenize once per row: feats_sql's bigram lambda
                   # re-evaluates a non-column token expression per
                   # element (the d58 feated comment)
                   F.expr(feats_sql("tk")).alias("feats")))
        labeled = pre.select(
            "doc_id", "lang", "verdict", "y", "split", "n_tokens",
            F.explode("feats").alias("f"))
        return labeled.select(
            "doc_id", "lang", "verdict", "y", "split", "n_tokens",
            F.expr(_BUCKET_SPARK).alias("bucket"))

    return memo_frame(spark, f"classifier_occ:{sf}", build, sf_dir=sf)


def d60_weights_frame(spark: SparkSession, sf: str) -> DataFrame:
    """The TRAINED model: (bucket, w_ppm) learned from the corpus's own
    curation verdicts (d26) — per-bucket label polarity
    (keep_n - drop_n) / (keep_n + drop_n) in integer ppm, CENTERED on
    the corpus-wide prior polarity. Centering is what keeps the verdict
    dimension non-degenerate: d26 keeps most documents, so every raw
    polarity would sit near the (positive) prior and `score > 0` would
    be constant-true — the exact failure mode the round-6 ADVICE flagged
    in d58's bias. All arithmetic is integer (sums + one truncating
    division per bucket), so Spark and the oracle reproduce the model
    bit-for-bit; no float log-odds to diverge.

    Persisted through `llm/index_cache.memo_frame`: trained at most once
    per corpus across sessions (the production shape — a quality
    classifier is trained once and served corpus-wide; at 100 TB the
    training pass is a scheduled job, inference is every ingest batch).

    Plan: one corpus pass — the d26 verdict columns fold into the scan
    projection (the digest window is the only doc-level shuffle), the
    feature explode carries the label, and the per-bucket rollup is a
    4096-key aggregate with map-side partials. The prior is a 1-row
    aggregate broadcast back over the <=4096-row weight table.
    """
    from etl_docker_spark.llm.index_cache import memo_frame

    def build() -> DataFrame:
        occ = classifier_occ_frame(spark, sf).select("y", "bucket")
        counts = (occ.groupBy("bucket")
                  .agg(F.sum("y").cast("long").alias("n1"),
                       F.sum(1 - F.col("y")).cast("long").alias("n0")))
        prior = counts.agg(F.sum("n1").alias("g1"), F.sum("n0").alias("g0"))
        pol = f"(n1 - n0) * {_D60_SCALE} DIV (n1 + n0)"
        gpol = f"(g1 - g0) * {_D60_SCALE} DIV (g1 + g0)"
        return (counts.crossJoin(F.broadcast(prior))
                .select("bucket",
                        F.expr(f"{pol} - {gpol}").cast("long")
                        .alias("w_ppm")))

    return memo_frame(spark, f"d60_weights:{sf}", build, sf_dir=sf)


def d60_trained_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Inference with the d60-TRAINED weight table, gated as a confusion
    matrix against the training labels: per (verdict, keep_pred) doc
    counts and score mass. This closes the loop d58/d59 left open ("a
    trained table changes nothing" was asserted, not evidenced): the
    model here is genuinely learned from data, flows through the same
    broadcast-join inference plan as d59, and the oracle RE-TRAINS the
    identical model from scratch in SQL — so the gate covers training
    arithmetic, artifact persistence, and serving in one query.

    Scale shape: inference is d59's explode + broadcast-join + per-doc
    rollup (the multi-GB-model shape degrades to a bucketed join; the
    <=4096-row table here broadcasts). Scores are mean centered feature
    polarity in ppm; keep_pred = score > 0 — exercised on BOTH sides
    because the weights are prior-centered (see d60_weights_frame).
    """
    per_doc = d60_scores_frame(spark, sf)
    return (per_doc.groupBy("verdict", "keep_pred")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("score_ppm").cast("long").alias("sum_score_ppm"))
            .orderBy("verdict", "keep_pred"))


def d60_scores_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document quality scores from the d60-trained model:
    (doc_id, verdict, n_tokens, score_ppm, keep_pred) — memoized like
    the weight table, because this is the second persisted artifact of
    a production scoring pipeline: score the corpus ONCE, then every
    consumer (the confusion gate d60, the threshold sweep d61, any
    future mixing/ablation query) reads the scores table instead of
    re-running inference. The inference pass itself is d59's
    explode + broadcast-join + per-doc rollup."""
    from etl_docker_spark.llm.index_cache import memo_frame

    def build() -> DataFrame:
        weights = d60_weights_frame(spark, sf)
        occ = classifier_occ_frame(spark, sf).select(
            "doc_id", "verdict", "n_tokens", "bucket")
        scored = (occ.join(F.broadcast(weights), "bucket")
                  .groupBy("doc_id", "verdict", "n_tokens")
                  .agg(F.count("*").cast("long").alias("n_feats"),
                       F.sum("w_ppm").cast("long").alias("sum_ppm")))
        score = F.expr("sum_ppm DIV n_feats")
        return scored.select("doc_id", "verdict", "n_tokens",
                             score.alias("score_ppm"),
                             (score > 0).alias("keep_pred"))

    return memo_frame(spark, f"d60_scores:{sf}", build, sf_dir=sf)


# The oracle retrains the model from scratch: same labels, same hashed
# features, same integer polarity arithmetic, same centering — then runs
# the same inference and rollup. DuckDB `//` truncates toward zero like
# Spark DIV (verified on negative operands), so the trained weights are
# bit-identical.
_D60_FEATS_DUCK = """
list_concat(
  string_split(text, ' '),
  list_transform(
    generate_series(1, len(string_split(text, ' ')) - 1),
    i -> string_split(text, ' ')[i] || '_'
         || string_split(text, ' ')[i + 1]))
"""

D60_SQL = rf"""
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN n_tokens < {_ORACLE_MIN_TOKENS} THEN 'too_short'
              WHEN 2 * n_unique < n_tokens THEN 'low_diversity'
              WHEN dup_rn > 1 THEN 'exact_dup'
              ELSE 'keep' END AS verdict
  FROM (
    SELECT doc_id, text,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
             AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]')))
                AS BIGINT) AS n_unique,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
             AS dup_rn
    FROM documents
  )
),
lab AS (
  SELECT doc_id, verdict,
         CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END AS y,
         {_D60_FEATS_DUCK} AS feats
  FROM labeled
),
occ AS (
  SELECT doc_id, verdict, y,
         CAST('0x' || substring(md5(unnest(feats)), 1, 8) AS BIGINT)
           % {_D58_BUCKETS} AS bucket
  FROM lab
),
counts AS (
  SELECT bucket,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM occ GROUP BY bucket
),
prior AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS g1, CAST(SUM(n0) AS BIGINT) AS g0
  FROM counts
),
w AS (
  SELECT bucket,
         CAST((n1 - n0) * {_D60_SCALE} // (n1 + n0)
              - (g1 - g0) * {_D60_SCALE} // (g1 + g0) AS BIGINT) AS w_ppm
  FROM counts, prior
),
scored AS (
  SELECT doc_id, verdict,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(w.w_ppm) AS BIGINT) AS sum_ppm
  FROM occ JOIN w USING (bucket)
  GROUP BY doc_id, verdict
),
p AS (
  SELECT verdict, sum_ppm // n_feats AS score_ppm FROM scored
)
SELECT verdict, score_ppm > 0 AS keep_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm
FROM p
GROUP BY verdict, keep_pred
ORDER BY verdict, keep_pred
"""

ROUND7.update({
    "d60_trained_classifier": (d60_trained_classifier, D60_SQL),
})

# ---------------------------------------------------------------- q94


def q94_variant_battery(spark: SparkSession, sf: str) -> DataFrame:
    """The VARIANT semi-structured type surface (native in this Spark
    4.1 build — the round-7 probe find): JSON text is parsed ONCE into
    the binary VARIANT encoding and every downstream access is a typed
    path extraction (`variant_get`), not a re-parse — the schema-on-read
    shape for heterogeneous event/API payloads where the reference's
    pandas pipelines re-flatten nested JSON per use
    (`CotyData_IPN.py:331-371`, nested `Tax`/`Audit` structs).

    The battery: build one JSON document per order (header + sorted
    items array) from the relational tables, `parse_json` it, then
    recover everything through the variant path language — scalar gets
    with type coercion (`$.okey` bigint, `$.prio` string), nested array
    indexing (`$.items[0].qty`), array extraction + explode
    (`$.items` as array<variant>), and `try_variant_get` null-safety on
    a missing path — and pin the per-priority rollup of the extracted
    values against the same rollup computed directly from the columns
    the JSON was built from. Equality here proves the
    relational -> JSON -> VARIANT -> typed-extraction loop is lossless.

    Scale shape: the expensive operator is the per-order items
    aggregation (one shuffle, shared with the direct path at 100 TB —
    building the documents IS the workload); parse_json/variant_get are
    per-row codegen expressions on top. The explode doubles as the
    fan-out every VARIANT ingest pipeline pays to re-relationalize
    nested arrays — measured against the identical explode-free numbers
    recovered via `$.items[i]` indexing.
    """
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    items = (li.select(
        "l_orderkey",
        # floor() before the bigint cast makes the truncation EXPLICIT
        # on both engines (Spark's decimal->bigint cast truncates while
        # DuckDB's rounds; these columns are integer-valued and
        # positive, so floor == trunc and both engines agree by
        # construction rather than by corpus luck)
        F.struct(
            F.col("l_linenumber").cast("int").alias("ln"),
            F.floor(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("bigint").alias("qty"),
            F.floor(F.col("l_extendedprice").cast("decimal(12,4)") * 100)
            .cast("bigint").alias("price_c")).alias("it"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("it")).alias("items")))
    # Same fix as q96: orders broadcasts, so the JSON build + VARIANT
    # parse otherwise run at the items-aggregate's AQE-coalesced width
    # (bytes are the coalescer's proxy, not expression CPU). The derived
    # key survives static elimination (o_orderkey itself is equivalent
    # to the child's l_orderkey hash partitioning). (optimization r12)
    docs = (orders.join(items, orders.o_orderkey == items.l_orderkey)
            .repartition(spark.sparkContext.defaultParallelism,
                         F.pmod(F.col("o_orderkey"), F.lit(1 << 20)))
            .select(F.to_json(F.struct(
                F.col("o_orderkey").alias("okey"),
                F.col("o_orderpriority").alias("prio"),
                F.col("items"))).alias("js")))
    v = docs.select(F.parse_json(F.col("js")).alias("v"))
    extracted = v.select(
        F.expr("variant_get(v, '$.okey', 'bigint')").alias("okey"),
        F.expr("variant_get(v, '$.prio', 'string')").alias("prio"),
        F.expr("variant_get(v, '$.items[0].qty', 'bigint')")
        .alias("first_qty"),
        F.expr("try_variant_get(v, '$.no_such_field', 'bigint')")
        .alias("absent"),
        F.expr("explode(variant_get(v, '$.items', 'array<variant>'))")
        .alias("item"))
    per_item = extracted.select(
        "okey", "prio", "first_qty", "absent",
        F.expr("variant_get(item, '$.qty', 'bigint')").alias("qty"),
        F.expr("variant_get(item, '$.price_c', 'bigint')").alias("price_c"))
    return (per_item.groupBy("prio")
            .agg(F.count_distinct("okey").cast("long").alias("n_orders"),
                 F.count("*").cast("long").alias("n_items"),
                 F.sum("qty").cast("long").alias("sum_qty"),
                 F.sum("price_c").cast("long").alias("sum_price_c"),
                 F.sum(F.col("first_qty")
                       * F.when(F.col("absent").isNull(), 1).otherwise(0))
                 .cast("long").alias("sum_first_qty"))
            .orderBy("prio"))


# The oracle never builds JSON: it recomputes the same rollup straight
# from the relational columns — equality pins the VARIANT loop lossless.
# sum_first_qty re-counts the first (lowest-linenumber) item's qty once
# per ITEM row, mirroring the Spark side where first_qty rides along the
# explode (and `absent` is NULL for every row, so the when() keeps the
# full sum — the null-safety path is load-bearing, not decorative).
Q94_SQL = """
WITH it AS (
  SELECT l_orderkey, l_linenumber AS ln,
         CAST(floor(CAST(l_quantity AS DECIMAL(12,4))) AS BIGINT) AS qty,
         CAST(floor(CAST(l_extendedprice AS DECIMAL(12,4)) * 100)
              AS BIGINT) AS price_c
  FROM lineitem
),
per_order AS (
  -- first_qty tie-break must mirror Spark's sort_array over the FULL
  -- struct (ln, qty, price_c): (orderkey, linenumber) is NOT unique in
  -- this corpus, so ordering by ln alone is nondeterministic
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(qty) AS BIGINT) AS sum_qty,
         CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
         CAST(first(qty ORDER BY ln, qty, price_c) AS BIGINT) AS first_qty
  FROM it
  GROUP BY l_orderkey
)
SELECT o.o_orderpriority AS prio,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(p.n_items) AS BIGINT) AS n_items,
       CAST(SUM(p.sum_qty) AS BIGINT) AS sum_qty,
       CAST(SUM(p.sum_price_c) AS BIGINT) AS sum_price_c,
       CAST(SUM(p.first_qty * p.n_items) AS BIGINT) AS sum_first_qty
FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY 1
ORDER BY 1
"""

ROUND7.update({
    "q94_variant_battery": (q94_variant_battery, Q94_SQL),
})

# ---------------------------------------------------------------- s30


def s30_stream_variant_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING ingest of HETEROGENEOUS JSON through the VARIANT type
    (q94's probe find, applied where it earns its keep): five event
    shapes share one feed — nested object (view.meta.ms), flat scalar +
    array-of-objects (purchase.cents/.items), array-of-ints
    (click.depth), string ref (signup.ref), int + bool (error.code/
    .fatal) — and the stream parses each line ONCE into VARIANT, then
    recovers a per-type metric by typed path extraction inside a CASE
    on the discriminator. No per-shape schema, no PERMISSIVE column
    padding (s12's fixed-schema ingest needs every field declared on
    every line; here each shape carries only its own fields — the
    schema-evolution story: a sixth shape tomorrow is a new CASE arm,
    not a reader-schema migration).

    Three text files -> three micro-batches (maxFilesPerTrigger=1);
    complete-mode rollup per type. The oracle recomputes every metric
    straight from the relational columns the JSON was built from, so
    the gate pins the JSON -> VARIANT -> typed-extraction loop lossless
    across micro-batch boundaries.

    Scale shape: parse_json/variant_get are per-row codegen expressions
    (VARIANT parses once into a binary encoding; each extraction is a
    path walk, not a re-parse); state is 5 groups. At 100 TB feed rate
    the cost IS the scan — identical to s12's, with the reader schema
    debt removed.
    """
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import stream_state_partitions

    ev = t(spark, sf, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    i = F.col("event_id")
    payload = (
        F.when(F.col("event_type") == "view", F.to_json(F.struct(
            F.lit("view").alias("t"), i.alias("id"),
            F.struct(F.col("cents").alias("ms")).alias("meta"))))
        .when(F.col("event_type") == "purchase", F.to_json(F.struct(
            F.lit("purchase").alias("t"), i.alias("id"),
            F.col("cents").alias("cents"),
            F.array(F.struct((i % 5 + 1).alias("q")),
                    F.struct((i % 7 + 1).alias("q"))).alias("items"))))
        .when(F.col("event_type") == "click", F.to_json(F.struct(
            F.lit("click").alias("t"), i.alias("id"),
            F.array((i % 3).cast("long"),
                    (i % 4).cast("long")).alias("depth"))))
        .when(F.col("event_type") == "signup", F.to_json(F.struct(
            F.lit("signup").alias("t"), i.alias("id"),
            F.concat(F.lit("r"), (i % 10).cast("string")).alias("ref"))))
        .otherwise(F.to_json(F.struct(
            F.lit("error").alias("t"), i.alias("id"),
            (i % 503).alias("code"),
            (i % 2 == 0).alias("fatal")))))
    work = tempfile.mkdtemp(prefix="s30_")
    try:
        (ev.select(payload.alias("value"))
         .repartitionByRange(3, "event_id")
         .write.mode("overwrite").text(work))
        stream = (spark.readStream
                  .option("maxFilesPerTrigger", "1").text(work))
        vg = "try_variant_get(v, '{p}', 'bigint')"
        parsed = stream.select(F.parse_json(F.col("value")).alias("v"))
        metric = F.expr(
            "CASE variant_get(v, '$.t', 'string') "
            f"WHEN 'view' THEN {vg.format(p='$.meta.ms')} "
            f"WHEN 'purchase' THEN {vg.format(p='$.cents')} "
            f"+ {vg.format(p='$.items[0].q')} + {vg.format(p='$.items[1].q')} "
            f"WHEN 'click' THEN {vg.format(p='$.depth[0]')} "
            f"+ {vg.format(p='$.depth[1]')} "
            "WHEN 'signup' THEN CAST(substring("
            "variant_get(v, '$.ref', 'string'), 2) AS BIGINT) "
            f"ELSE {vg.format(p='$.code')} END")
        flag = F.expr("CASE WHEN try_variant_get(v, '$.fatal', 'boolean') "
                      "THEN 1 ELSE 0 END").cast("long")
        grouped = (parsed.select(
            F.expr("variant_get(v, '$.t', 'string')").alias("grp"),
            metric.alias("metric"), flag.alias("flag"))
            .groupBy("grp")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("metric").cast("long").alias("sum_metric"),
                 F.sum("flag").cast("long").alias("n_fatal")))
        name = f"s30_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (grouped.writeStream.outputMode("complete").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S30_SQL = """
SELECT event_type AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE event_type
                WHEN 'view' THEN CAST(round(value * 100, 0) AS BIGINT)
                WHEN 'purchase' THEN CAST(round(value * 100, 0) AS BIGINT)
                     + event_id % 5 + 1 + event_id % 7 + 1
                WHEN 'click' THEN event_id % 3 + event_id % 4
                WHEN 'signup' THEN event_id % 10
                ELSE event_id % 503 END) AS BIGINT) AS sum_metric,
       CAST(SUM(CASE WHEN event_type = 'error' AND event_id % 2 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_fatal
FROM events
GROUP BY 1
"""

ROUND7.update({
    "s30_stream_variant_ingest": (s30_stream_variant_ingest, S30_SQL),
})

# ---------------------------------------------------------------- d61

_D61_GRID_LO = -300   # same clamped ppm grid discipline as d59
_D61_GRID_W = 601
_D61_CELLS = 20


def d61_threshold_yield_curve(spark: SparkSession, sf: str) -> DataFrame:
    """The curation-economics consumer of d60's trained scores: the
    THRESHOLD SWEEP — for every candidate keep-threshold on a fixed ppm
    grid, how many documents and how much token mass survive. This is
    the table a curation team actually reads to place the knife (the
    d18/d23/d43 economics family, now driven by a LEARNED score instead
    of rule verdicts): each row answers "keep everything scoring above
    cell c" with exact cumulative counts.

    Scale shape: per-doc scores come from the memoized scores table
    (`d60_scores_frame` — score once, consume everywhere; the
    production shape for a corpus-wide quality score); the sweep
    itself is a 20-cell grid rollup (map-side partials)
    followed by a grid x histogram triangle join — the 20-row
    threshold grid (a `spark.range` literal, constant at any corpus
    size) broadcast against the 20-row histogram, LEFT so every
    candidate threshold reports a row even when nothing scores above
    it. Histogram first, order statistics second (d59's trick): the
    cumulative step never sees a data-sized frame, and unlike a
    global-window rewrite the boundedness is structural (the BNLJ's
    broadcast side is a literal range), surviving AQE replanning.
    """
    scored = d60_scores_frame(spark, sf)
    cell_w = _D61_GRID_W * 1.0 / _D61_CELLS
    cell = F.least(F.greatest(
        F.floor((F.col("score_ppm") - _D61_GRID_LO) / cell_w), F.lit(0)),
        F.lit(_D61_CELLS - 1)).cast("long")
    hist = (scored.select(cell.alias("hcell"), "n_tokens")
            .groupBy("hcell")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))
    # cumulative FROM THE TOP: "keep cell c and above" — every histogram
    # cell >= the threshold contributes; LEFT keeps empty thresholds
    grid = spark.range(_D61_CELLS).select(F.col("id").alias("cell"))
    return (F.broadcast(grid)
            .join(hist, F.col("hcell") >= F.col("cell"), "left")
            .groupBy("cell")
            .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long")
                 .alias("docs_kept"),
                 F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long")
                 .alias("tokens_kept"))
            .orderBy("cell"))


# Oracle: re-derives d60's trained scores end-to-end (training included),
# then the same grid histogram + top-down running totals.
D61_SQL = rf"""
WITH labeled AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
           AS n_tokens,
         CASE WHEN CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
                        AS BIGINT) < {_ORACLE_MIN_TOKENS} THEN 0
              WHEN 2 * CAST(len(list_distinct(
                       regexp_extract_all(text, '\w+|[^\w\s]')))
                       AS BIGINT)
                   < CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
                          AS BIGINT) THEN 0
              WHEN row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) > 1 THEN 0
              ELSE 1 END AS y,
         {_D60_FEATS_DUCK} AS feats
  FROM documents
),
occ AS (
  SELECT doc_id, n_tokens, y,
         CAST('0x' || substring(md5(unnest(feats)), 1, 8) AS BIGINT)
           % {_D58_BUCKETS} AS bucket
  FROM labeled
),
counts AS (
  SELECT bucket,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM occ GROUP BY bucket
),
prior AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS g1, CAST(SUM(n0) AS BIGINT) AS g0
  FROM counts
),
w AS (
  SELECT bucket,
         CAST((n1 - n0) * {_D60_SCALE} // (n1 + n0)
              - (g1 - g0) * {_D60_SCALE} // (g1 + g0) AS BIGINT) AS w_ppm
  FROM counts, prior
),
scored AS (
  SELECT doc_id, any_value(n_tokens) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(w.w_ppm) AS BIGINT) AS sum_ppm
  FROM occ JOIN w USING (bucket)
  GROUP BY doc_id
),
cells AS (
  SELECT least(greatest(CAST(floor(
           ((sum_ppm // n_feats) - {_D61_GRID_LO})
           / ({_D61_GRID_W} * 1.0 / {_D61_CELLS})) AS BIGINT), 0),
           {_D61_CELLS - 1}) AS cell,
         n_tokens
  FROM scored
),
hist AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM cells GROUP BY cell
),
grid AS (
  SELECT unnest(generate_series(0, {_D61_CELLS - 1})) AS cell
)
SELECT g.cell,
       CAST(COALESCE(SUM(h.n_docs), 0) AS BIGINT) AS docs_kept,
       CAST(COALESCE(SUM(h.n_tokens), 0) AS BIGINT) AS tokens_kept
FROM grid g LEFT JOIN hist h ON h.cell >= g.cell
GROUP BY g.cell
ORDER BY g.cell
"""

ROUND7.update({
    "d61_threshold_yield_curve": (d61_threshold_yield_curve, D61_SQL),
})
