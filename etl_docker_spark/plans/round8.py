"""Round-8 queries.

q95 was written and oracle-verified in round 7 but held off the
registry until round 8 so the committed 216-query artifacts stayed
synchronized (the round-5 lesson); it registers here first thing.
Probe findings the VARIANT family builds on: VARIANT survives a
parquet write/read round trip (shredded two-binary encoding),
`to_variant_object` constructs variants natively from nested
structs/arrays (no JSON text on the write path), and
`from_json(..., 'variant')` works for streaming ingest (s31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t
from etl_docker_spark.plans.round2f import _MIN_TOKENS
from etl_docker_spark.plans.round6 import _D58_BUCKETS
from etl_docker_spark.plans.round7 import (_D60_FEATS_DUCK, _D60_SCALE,
                                           _D61_CELLS)

ROUND8: dict = {}

# ---------------------------------------------------------------- q95



def q95_variant_persistence(spark: SparkSession, sf: str) -> DataFrame:
    """The STORAGE half of the VARIANT story (q94 covers the expression
    half): semi-structured documents land in the lake AS a variant
    parquet column and are consumed by typed path extraction on the
    read side — the schema-on-read table layout for event/API payloads
    (Spark writes variant as the two-binary-chunk shredded encoding;
    no JSON re-parse on any read). The battery also pins the NATIVE
    constructor: documents are built with `to_variant_object` over
    nested structs/arrays — no JSON text anywhere on the write path —
    and must round-trip the parquet write/read losslessly.

    Gate: write per-order variant docs (header + sorted items array)
    to parquet, read them back, recover the per-priority rollup via
    variant_get, and pin it against the oracle's direct relational
    computation. Construction parity with q94's parse_json(to_json(..))
    path is pinned separately in tests/test_round7.py.

    Scale shape: the write is the workload (one items aggregation
    shuffle, then a parallel parquet write); reads after it are
    scan-speed path walks. At 100 TB this is the landing-zone pattern:
    pay the variant encode once at ingest, every downstream consumer
    skips JSON parsing forever.
    """
    import os
    import shutil
    import tempfile

    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    items = (li.select(
        "l_orderkey",
        # explicit floor before the bigint cast — same truncate-vs-round
        # cross-engine rationale as q94 (values positive: floor == trunc)
        F.struct(
            F.col("l_linenumber").cast("int").alias("ln"),
            F.floor(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("bigint").alias("qty")).alias("it"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("it")).alias("items")))
    # Same coalesced-width finding as q96/q94: without the explicit
    # exchange the variant ENCODE and the parquet write both run at the
    # items-aggregate's AQE-coalesced width (one task at gate scale —
    # the docstring's "parallel parquet write" was not actually
    # parallel). (optimization r12)
    docs = (orders.join(items, orders.o_orderkey == items.l_orderkey)
            .repartition(spark.sparkContext.defaultParallelism,
                         F.pmod(F.col("o_orderkey"), F.lit(1 << 20)))
            .select(F.expr(
                "to_variant_object(named_struct("
                "'okey', o_orderkey, 'prio', o_orderpriority, "
                "'items', items))").alias("v")))
    work = tempfile.mkdtemp(prefix="q95_")
    try:
        path = os.path.join(work, "docs")
        docs.write.mode("overwrite").parquet(path)
        back = spark.read.parquet(path)
        extracted = back.select(
            F.expr("variant_get(v, '$.okey', 'bigint')").alias("okey"),
            F.expr("variant_get(v, '$.prio', 'string')").alias("prio"),
            F.expr("size(variant_get(v, '$.items', 'array<variant>'))")
            .cast("long").alias("n_items"),
            F.expr("variant_get(v, '$.items[0].qty', 'bigint')")
            .alias("first_qty"))
        return (extracted.groupBy("prio")
                .agg(F.count("*").cast("long").alias("n_orders"),
                     F.sum("n_items").cast("long").alias("n_items"),
                     F.sum("first_qty").cast("long").alias("sum_first_qty"))
                .orderBy("prio")
                # the variant scan must finish before the temp dir dies
                .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q95_SQL = """
WITH it AS (
  SELECT l_orderkey, l_linenumber AS ln,
         CAST(floor(CAST(l_quantity AS DECIMAL(12,4))) AS BIGINT) AS qty
  FROM lineitem
),
per_order AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(first(qty ORDER BY ln, qty) AS BIGINT) AS first_qty
  FROM it
  GROUP BY l_orderkey
)
SELECT o.o_orderpriority AS prio,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(p.n_items) AS BIGINT) AS n_items,
       CAST(SUM(p.first_qty) AS BIGINT) AS sum_first_qty
FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY 1
ORDER BY 1
"""

ROUND8.update({
    "q95_variant_persistence": (q95_variant_persistence, Q95_SQL),
})

# ---------------------------------------------------------------- s31


def s31_stream_variant_landing(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING landing of a real semi-structured column through
    `from_json(..., 'variant')` — the round-7 probe finding q94/s30 left
    un-queried. s30 built heterogeneous JSON and parsed it with
    `parse_json`; here the VARIANT conversion happens INSIDE the reader
    expression (`from_json` with the 'variant' target type — the
    PERMISSIVE-into-variant landing pattern), applied to the events
    table's actual `props` JSON column, and the extraction feeds an
    EVENT-TIME windowed aggregate: per (day, event_type), event count,
    the sum of the `$.k` payload field, and the count of rows where a
    missing path extracts NULL (`try_variant_get` — the null path is
    load-bearing: it contributes one per row, so a parse regression
    that nulls whole documents would shift the metric).

    The batch q13 consumes the same column with `get_json_object`
    (re-parses the JSON text per access); the VARIANT landing parses
    once per row into the binary encoding, after which every extraction
    is a path walk — the difference that compounds when one payload
    feeds many metrics.

    Scale shape: parse + extraction are per-row codegen expressions in
    the stream's select; state is (days x event_types) windowed groups
    behind a watermark. At a 100 TB/day feed the cost is the scan plus
    one windowed shuffle — identical to s01's, with the JSON parsing
    folded into the same pass instead of a downstream re-parse job.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    stream = _events_stream(spark, sf)
    parsed = stream.select(
        "ts", "event_type",
        F.expr("from_json(props, 'variant')").alias("v"))
    extracted = parsed.select(
        "ts", "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(v, '$.no_such_key', 'bigint')")
        .alias("absent"))
    agg = (extracted.withWatermark("ts", "1 minute")
           .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.sum("k").cast("long").alias("sum_k"),
                F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0))
                .cast("long").alias("n_missing"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n_events", "sum_k", "n_missing"))
    name = f"s31_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S31_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
         AS window_end,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n_missing
FROM events
GROUP BY 1, 2, 3
"""

ROUND8.update({
    "s31_stream_variant_landing": (s31_stream_variant_landing, S31_SQL),
})

# ---------------------------------------------------------------- d62

# Calibration target: per language, place the keep-threshold as HIGH as
# possible while still keeping >= this percentage of the language's token
# mass. Integer percent so the comparison is exact on both engines.
_D62_KEEP_TARGET_PCT = 60
# d62 gets its OWN grid, sized to the TRAINED score distribution: d60
# scores span roughly [-43k, +90k] ppm across the test corpora (d61's
# [-300, 301) grid was tuned for d58's formula scores and would clamp
# nearly all trained mass into the two edge cells, making every knife
# land on cell 0). 20 cells of 3000 ppm over [-30000, 30001) puts the
# bulk of the mass (p10..p90 is within +/-33k at every SF) on the
# interior, so the calibrated cell actually varies by language.
_D62_GRID_LO = -30000
_D62_GRID_W = 60001


def d62_lang_calibrated_thresholds(spark: SparkSession, sf: str) -> DataFrame:
    """PER-LANGUAGE calibrated keep-thresholds over the d60-trained
    scores — the real curation knife is per-language (a single global
    threshold under- or over-prunes whichever languages the classifier
    scores systematically lower): for each lang, the HIGHEST grid
    threshold that still keeps >= _D62_KEEP_TARGET_PCT (60%) of that
    language's token mass, with the exact docs/tokens kept at that
    knife and the kept fraction in ppm.

    Consumes the memoized per-doc scores table (`d60_scores_frame` —
    score once, consume everywhere) joined back to the corpus for lang;
    at 100 TB a production scores table would carry lang natively and
    the join disappears — here it is one co-partitioned hash join on
    doc_id. Everything after the join is tiny: a (lang x 20)-cell
    histogram with map-side partials, the d61 literal-grid triangle
    join for cumulatives (structurally bounded BNLJ — the broadcast
    side is a 20-row `spark.range`), and a per-lang `max_by` pick. No
    global windows anywhere.

    Integer discipline: the target comparison is cross-multiplied
    (`tokens_kept * 100 >= target * total_tokens`) and kept_ppm is
    `tokens_kept * 1e6 DIV total_tokens` — exact on both engines.
    (At corpora beyond ~9e12 tokens the ppm numerator would need a
    pre-scale; the comparison itself stays in range far longer.)
    """
    from etl_docker_spark.plans.round7 import d60_scores_frame

    scored = d60_scores_frame(spark, sf)
    docs = t(spark, sf, "documents").select("doc_id", "lang")
    cell_w = _D62_GRID_W * 1.0 / _D61_CELLS
    cell = F.least(F.greatest(
        F.floor((F.col("score_ppm") - _D62_GRID_LO) / cell_w), F.lit(0)),
        F.lit(_D61_CELLS - 1)).cast("long")
    hist = (scored.join(docs, "doc_id")
            .select("lang", cell.alias("hcell"), "n_tokens")
            .groupBy("lang", "hcell")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))
    totals = (hist.groupBy("lang")
              .agg(F.sum("n_docs").cast("long").alias("total_docs"),
                   F.sum("n_tokens").cast("long").alias("total_tokens")))
    grid = spark.range(_D61_CELLS).select(F.col("id").alias("cell"))
    cum = (F.broadcast(grid)
           .join(hist, F.col("hcell") >= F.col("cell"))
           .groupBy("lang", "cell")
           .agg(F.sum("n_docs").cast("long").alias("docs_kept"),
                F.sum("n_tokens").cast("long").alias("tokens_kept")))
    ok = (cum.join(totals, "lang")
          .filter(F.col("tokens_kept") * 100
                  >= _D62_KEEP_TARGET_PCT * F.col("total_tokens")))
    return (ok.groupBy("lang")
            .agg(F.max("cell").cast("long").alias("chosen_cell"),
                 F.max_by("docs_kept", "cell").cast("long")
                 .alias("docs_kept"),
                 F.max_by("tokens_kept", "cell").cast("long")
                 .alias("tokens_kept"),
                 F.max("total_docs").cast("long").alias("total_docs"),
                 F.max("total_tokens").cast("long").alias("total_tokens"))
            .select("lang", "chosen_cell", "docs_kept", "tokens_kept",
                    "total_docs", "total_tokens",
                    F.expr("tokens_kept * 1000000 DIV total_tokens")
                    .cast("long").alias("kept_ppm"))
            .orderBy("lang"))


# Oracle: re-derives the trained scores end-to-end (training included,
# as in D61), joins lang back, then the same histogram -> cumulative ->
# per-lang arg_max pick. All-integer arithmetic throughout.
D62_SQL = rf"""
WITH labeled AS (
  SELECT doc_id, lang, text,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
           AS n_tokens,
         CASE WHEN CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
                        AS BIGINT) < {_MIN_TOKENS} THEN 0
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
  SELECT doc_id, lang, n_tokens, y,
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
  SELECT doc_id, any_value(lang) AS lang,
         any_value(n_tokens) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(w.w_ppm) AS BIGINT) AS sum_ppm
  FROM occ JOIN w USING (bucket)
  GROUP BY doc_id
),
cells AS (
  SELECT lang,
         least(greatest(CAST(floor(
           ((sum_ppm // n_feats) - {_D62_GRID_LO})
           / ({_D62_GRID_W} * 1.0 / {_D61_CELLS})) AS BIGINT), 0),
           {_D61_CELLS - 1}) AS hcell,
         n_tokens
  FROM scored
),
hist AS (
  SELECT lang, hcell, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM cells GROUP BY lang, hcell
),
totals AS (
  SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS total_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM hist GROUP BY lang
),
grid AS (
  SELECT unnest(generate_series(0, {_D61_CELLS - 1})) AS cell
),
cum AS (
  SELECT h.lang, g.cell,
         CAST(SUM(h.n_docs) AS BIGINT) AS docs_kept,
         CAST(SUM(h.n_tokens) AS BIGINT) AS tokens_kept
  FROM grid g JOIN hist h ON h.hcell >= g.cell
  GROUP BY h.lang, g.cell
),
ok AS (
  SELECT c.lang, c.cell, c.docs_kept, c.tokens_kept,
         t.total_docs, t.total_tokens
  FROM cum c JOIN totals t USING (lang)
  WHERE c.tokens_kept * 100 >= {_D62_KEEP_TARGET_PCT} * t.total_tokens
)
SELECT lang,
       CAST(MAX(cell) AS BIGINT) AS chosen_cell,
       CAST(arg_max(docs_kept, cell) AS BIGINT) AS docs_kept,
       CAST(arg_max(tokens_kept, cell) AS BIGINT) AS tokens_kept,
       CAST(MAX(total_docs) AS BIGINT) AS total_docs,
       CAST(MAX(total_tokens) AS BIGINT) AS total_tokens,
       CAST(arg_max(tokens_kept, cell) * 1000000 // MAX(total_tokens)
            AS BIGINT) AS kept_ppm
FROM ok
GROUP BY lang
ORDER BY lang
"""

ROUND8.update({
    "d62_lang_calibrated_thresholds": (d62_lang_calibrated_thresholds,
                                       D62_SQL),
})

# ---------------------------------------------------------------- d63

# d37's content-free hash split, reused verbatim: train on buckets < 80,
# hold out the rest. Hash-of-key keeps the split reproducible across
# engines, runs, and corpus growth — the property that makes the
# generalization gap measurable at all.
_D63_TRAIN_PCT = 80


def _d63_split() -> F.Column:
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
    return (F.when(F.pmod(h, F.lit(100)) < _D63_TRAIN_PCT, "train")
            .otherwise("holdout"))


def d63_weights_frame(spark: SparkSession, sf: str) -> DataFrame:
    """d60's trained model re-fit on the TRAIN hash-split only (d37's
    bucketing, 80/20) — the held-out 20% never touches the training
    aggregate, so scoring it measures generalization, not memorization.
    Same integer-ppm prior-centered arithmetic as d60_weights_frame;
    memoized separately because it is a genuinely different artifact
    (different training set -> different weights)."""
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.plans.round7 import classifier_occ_frame

    def build() -> DataFrame:
        occ = (classifier_occ_frame(spark, sf)
               .filter(F.col("split") == "train")
               .select("y", "bucket"))
        counts = (occ.groupBy("bucket")
                  .agg(F.sum("y").cast("long").alias("n1"),
                       F.sum(1 - F.col("y")).cast("long").alias("n0")))
        prior = counts.agg(F.sum("n1").alias("g1"),
                           F.sum("n0").alias("g0"))
        pol = f"(n1 - n0) * {_D60_SCALE} DIV (n1 + n0)"
        gpol = f"(g1 - g0) * {_D60_SCALE} DIV (g1 + g0)"
        return (counts.crossJoin(F.broadcast(prior))
                .select("bucket",
                        F.expr(f"{pol} - {gpol}").cast("long")
                        .alias("w_ppm")))

    return memo_frame(spark, f"d63_weights:{sf}", build, sf_dir=sf)


def d63_holdout_generalization(spark: SparkSession, sf: str) -> DataFrame:
    """The TRAIN/HOLDOUT drift gate for the trained classifier — d60
    evidenced "the model fits its training labels"; this evidences
    "the model generalizes": weights fit on the 80% train split score
    BOTH halves, and the output is the per-(split, verdict, keep_pred)
    confusion table, so the generalization gap (holdout keep rates vs
    train keep rates, per verdict) is directly readable — and pinned,
    because the oracle retrains the split model from scratch in SQL.

    Two inference deltas vs d60, both load-bearing: the weight join is
    LEFT with COALESCE(w, 0) — a holdout document can carry feature
    buckets the train split never saw (unseen feature => no evidence
    => weight 0, the fastText convention), and every doc keeps its
    full feature count as the score denominator, so unseen features
    dilute toward 0 rather than vanish.

    Scale shape: identical to d60 — one training pass over 80% of the
    corpus into a <=4096-row broadcast model, one scoring pass over
    100%. The split predicate is a per-row hash, pushed into the scan
    projection; no extra shuffle anywhere.
    """
    from etl_docker_spark.plans.round7 import classifier_occ_frame

    weights = d63_weights_frame(spark, sf)
    occ = classifier_occ_frame(spark, sf).select(
        "doc_id", "split", "verdict", "bucket")
    scored = (occ.join(F.broadcast(weights), "bucket", "left")
              .groupBy("doc_id", "split", "verdict")
              .agg(F.count("*").cast("long").alias("n_feats"),
                   F.sum(F.coalesce(F.col("w_ppm"), F.lit(0)))
                   .cast("long").alias("sum_ppm")))
    score = F.expr("sum_ppm DIV n_feats")
    per_doc = scored.select("split", "verdict", score.alias("score_ppm"),
                            (score > 0).alias("keep_pred"))
    return (per_doc.groupBy("split", "verdict", "keep_pred")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("score_ppm").cast("long").alias("sum_score_ppm"))
            .orderBy("split", "verdict", "keep_pred"))


D63_SQL = rf"""
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short'
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
         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) % 100
                   < {_D63_TRAIN_PCT}
              THEN 'train' ELSE 'holdout' END AS split,
         {_D60_FEATS_DUCK} AS feats
  FROM labeled
),
occ AS (
  SELECT doc_id, verdict, split, y,
         CAST('0x' || substring(md5(unnest(feats)), 1, 8) AS BIGINT)
           % {_D58_BUCKETS} AS bucket
  FROM lab
),
counts AS (
  SELECT bucket,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM occ WHERE split = 'train' GROUP BY bucket
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
  SELECT o.doc_id, any_value(o.verdict) AS verdict,
         any_value(o.split) AS split,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(COALESCE(w.w_ppm, 0)) AS BIGINT) AS sum_ppm
  FROM occ o LEFT JOIN w USING (bucket)
  GROUP BY o.doc_id
),
p AS (
  SELECT split, verdict, sum_ppm // n_feats AS score_ppm FROM scored
)
SELECT split, verdict, score_ppm > 0 AS keep_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm
FROM p
GROUP BY split, verdict, keep_pred
ORDER BY split, verdict, keep_pred
"""

ROUND8.update({
    "d63_holdout_generalization": (d63_holdout_generalization, D63_SQL),
})

# ---------------------------------------------------------------- q96


def q96_xml_battery(spark: SparkSession, sf: str) -> DataFrame:
    """The XML semi-structured surface (round-8 probe find: to_xml /
    from_xml / the xpath_* family are all live in this build) — the
    XML sibling of q94's JSON/VARIANT battery, because plenty of real
    feeds (SOAP-era ERPs, invoice gateways, the kind of systems the
    reference's REST pipelines front) still speak XML: build one XML
    document per order (header + repeated <items> elements), then
    recover the rollup through BOTH extraction grammars — the typed
    `from_xml` schema read (struct + array-of-struct) and the
    standalone `xpath_long`/`xpath` path language (node-set sum and
    node count, computed independently of the schema read). The gate
    pins both paths against the oracle's direct relational rollup, so
    equality proves the relational -> XML -> typed-extraction loop is
    lossless AND the two grammars agree with each other.

    Scale shape: same as q94 — the per-order items aggregation is the
    one shuffle (shared with the direct path; building the documents
    IS the workload), to_xml/from_xml/xpath are per-row expressions.
    XML parse is heavier per byte than VARIANT's binary walk, which is
    the measured argument for landing XML feeds INTO variant/parquet
    once (q95) rather than re-parsing text downstream.
    """
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    items = (li.select(
        "l_orderkey",
        F.struct(
            F.col("l_linenumber").cast("int").alias("ln"),
            F.floor(F.col("l_quantity").cast("decimal(12,4)"))
            .cast("bigint").alias("qty")).alias("it"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("it")).alias("items")))
    # The XML build + double parse below is the workload (~40 µs/row of
    # expression CPU); orders broadcasts, so the whole battery runs at
    # the items-aggregate's AQE-coalesced width — measured ONE task at
    # gate scale (identical 6.6 s wall at 8 and at 32 cores: bytes are
    # the coalescer's proxy and a terrible one for parse CPU). A
    # repartition ON o_orderkey is statically eliminated (the join
    # output already carries the equivalent l_orderkey hash
    # partitioning), so spread on a derived deterministic key instead —
    # explicit-n repartitions are exempt from AQE coalescing.
    # (optimization r12)
    docs = (orders.join(items, orders.o_orderkey == items.l_orderkey)
            .repartition(spark.sparkContext.defaultParallelism,
                         F.pmod(F.col("o_orderkey"), F.lit(1 << 20)))
            .select(F.expr(
                "to_xml(named_struct('okey', o_orderkey, "
                "'prio', o_orderpriority, 'items', items))").alias("x")))
    xml_schema = "okey BIGINT, prio STRING, items ARRAY<STRUCT<ln: INT, qty: BIGINT>>"
    extracted = docs.select(
        F.expr(f"from_xml(x, '{xml_schema}')").alias("s"),
        F.expr("xpath_long(x, 'sum(ROW/items/qty)')").alias("xp_qty"),
        F.expr("CAST(size(xpath(x, 'ROW/items')) AS BIGINT)").alias("xp_n"))
    per_order = extracted.select(
        F.col("s.prio").alias("prio"),
        F.size("s.items").cast("long").alias("n_items"),
        F.expr("aggregate(s.items, CAST(0 AS BIGINT), "
               "(acc, it) -> acc + it.qty)").alias("st_qty"),
        "xp_qty", "xp_n")
    return (per_order.groupBy("prio")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.sum("n_items").cast("long").alias("n_items"),
                 F.sum("st_qty").cast("long").alias("sum_qty_struct"),
                 F.sum("xp_qty").cast("long").alias("sum_qty_xpath"),
                 F.sum("xp_n").cast("long").alias("n_items_xpath"))
            .orderBy("prio"))


# The oracle never builds XML: the same rollup straight from the
# relational columns — and BOTH extraction grammars must equal it
# (sum_qty_struct == sum_qty_xpath, n_items == n_items_xpath), so a
# regression in either the schema read or the xpath engine breaks the
# hash even though the other path still agrees.
Q96_SQL = """
WITH it AS (
  SELECT l_orderkey,
         CAST(floor(CAST(l_quantity AS DECIMAL(12,4))) AS BIGINT) AS qty
  FROM lineitem
),
per_order AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(qty) AS BIGINT) AS sum_qty
  FROM it GROUP BY l_orderkey
)
SELECT o.o_orderpriority AS prio,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(p.n_items) AS BIGINT) AS n_items,
       CAST(SUM(p.sum_qty) AS BIGINT) AS sum_qty_struct,
       CAST(SUM(p.sum_qty) AS BIGINT) AS sum_qty_xpath,
       CAST(SUM(p.n_items) AS BIGINT) AS n_items_xpath
FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY 1
ORDER BY 1
"""

ROUND8.update({
    "q96_xml_battery": (q96_xml_battery, Q96_SQL),
})

# ---------------------------------------------------------------- d64

# Bounded hash domain: projecting tokens into [0, 3000) caps each
# sketch's distinct count at 3000 < 2^13 (= _D64_LGK) nominal entries,
# so the theta sketches stay in EXACT mode at ANY corpus scale and the
# estimates are integers the oracle reproduces as plain distinct counts
# (the same exact-regime discipline d28 used for its portable HLL). A
# production run sketching RAW token ids instead accepts the
# ~1/sqrt(2^13) = 1.1% relative error — the machinery below is
# identical either way.
_D64_DOMAIN = 3000
_D64_LGK = 13

# The one definition of the bounded token-hash domain, shared by every
# sketch-tier consumer (d64 theta, d66 approx_top_k, d67 HLL, s32
# streaming HLL) so the exactness arguments can never desynchronize.
_TOK_BUCKET_SPARK = (f"pmod(CAST(conv(substring(md5(tok), 1, 8), 16, 10) "
                     f"AS BIGINT), {_D64_DOMAIN})")
_TOK_BUCKET_DUCK = (f"CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) "
                    f"% {_D64_DOMAIN}")


def d64_theta_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source vocabulary overlap via NATIVE theta sketches (the
    round-8 probe find: the Apache DataSketches theta family —
    theta_sketch_agg / union / intersection / difference — is live in
    this build): one sketch per source over the token-hash domain, then
    every source pair's union, intersection, A-only difference, and
    Jaccard in ppm, computed purely by SKETCH SET-ALGEBRA — no pairwise
    data join ever happens.

    This is the sketch-tier answer to d56's exact cross-source leakage
    query: at 100 TB you don't join corpora to ask "how much does
    source A share with source B" — you sketch each source in one
    map-side-combinable pass (theta states merge associatively, so
    1000 executors sketch partitions independently), keep the 5
    fixed-size sketch states, and answer every pairwise (and any
    future multi-way) set question from the states alone. Adding a
    source re-sketches ONE source, not the corpus.

    Gate exactness: see _D64_DOMAIN — bounded domain => exact mode =>
    the oracle pins every estimate as a plain COUNT(DISTINCT ...).
    The pairwise stage is a 5x5 self-join of sketch STATES (constant
    size at any corpus scale; allowlisted BNLJ like d61's literal
    grid).
    """
    docs = t(spark, sf, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    bucket = F.expr(_TOK_BUCKET_SPARK)
    sk = (toks.select("source", bucket.alias("b"))
          .groupBy("source")
          .agg(F.expr(f"theta_sketch_agg(b, {_D64_LGK})").alias("sk")))
    a = sk.select(F.col("source").alias("src_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("source").alias("src_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
    est = pairs.select(
        "src_a", "src_b",
        F.expr(f"theta_sketch_estimate(theta_union(sk_a, sk_b, "
               f"{_D64_LGK}))").alias("n_union"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
        .alias("n_common"),
        F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
        .alias("n_only_a"))
    return (est.select(
        "src_a", "src_b", "n_union", "n_common", "n_only_a",
        F.expr("n_common * 1000000 DIV n_union").alias("jaccard_ppm"))
        .orderBy("src_a", "src_b"))


D64_SQL = f"""
WITH tb AS (
  SELECT DISTINCT source,
         {_TOK_BUCKET_DUCK} AS b
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
),
srcs AS (SELECT DISTINCT source FROM documents),
pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a, srcs b WHERE a.source < b.source
),
j AS (
  SELECT pr.sa, pr.sb, t.b,
         MAX(CASE WHEN t.source = pr.sa THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN t.source = pr.sb THEN 1 ELSE 0 END) AS in_b
  FROM pairs pr JOIN tb t ON t.source IN (pr.sa, pr.sb)
  GROUP BY pr.sa, pr.sb, t.b
)
SELECT sa AS src_a, sb AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_union,
       CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
       CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_only_a,
       CAST(SUM(in_a * in_b) * 1000000 // COUNT(*) AS BIGINT)
         AS jaccard_ppm
FROM j GROUP BY sa, sb
ORDER BY sa, sb
"""

ROUND8.update({
    "d64_theta_source_overlap": (d64_theta_source_overlap, D64_SQL),
})
