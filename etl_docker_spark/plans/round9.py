"""Round-9 STAGED queries — written and oracle-verified in round 8,
deliberately NOT yet imported by the registry: round 8's committed
artifacts (CORRECTNESS_full_r8 / PLANS.md / BENCH_QUERIES / BENCH_SF1)
were regenerated at the 222-query surface, and registering more after
the fact would desynchronize every artifact count (the round-5 lesson,
applied successfully for q95 in rounds 7->8). Round 9 registers this
module first thing, then regenerates.

Round-8 probe findings these build on (tests/test_round8.py's
test_collation_primitives / test_listagg_within_group /
test_variant_explode_lateral pin the primitives): collations are live (UTF8_LCASE / UNICODE_CI_AI;
a collated group-by keeps the FIRST-SEEN representation, so outputs
must be canonicalized with lower() for cross-engine determinism),
`listagg(...) WITHIN GROUP (ORDER BY ...)` is live (DuckDB parity via
string_agg ORDER BY), and the `variant_explode` LATERAL table function
is live (pos/key/value columns). Also probed and deliberately NOT
staged: `approx_top_k` — its boundary tie-break is hash-order, not
lexicographic (probe: {a:2, b:1, c:1} with k=2 returned c, not b), so
a gated query needs a structural tie dodge first; `hll_sketch_agg` —
estimates are approximate at any cardinality outside the coupon-exact
phase, so DuckDB cannot reproduce them (d28's portable HLL remains the
gated path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND9: dict = {}

# ---------------------------------------------------------------- q97


def q97_collation_battery(spark: SparkSession, sf: str) -> DataFrame:
    """String COLLATION surface (round-8 probe find): case-insensitive
    grouping and equality through the UTF8_LCASE collation — the
    engine-level answer to the lower()-everywhere idiom the reference's
    pandas code uses for case-insensitive matching. A deterministic
    per-row case mangle (upper for even part keys, lower for odd)
    splits every brand into two case variants; grouping by the COLLATED
    key must merge them back — pinned against the oracle's lower()
    grouping, which is the collation's definition for ASCII data.

    The battery also exercises collated EQUALITY in an aggregate filter
    (count of rows case-insensitively equal to one brand spelled in the
    opposite case) and pins that the collated group keeps first-seen
    representation by NOT emitting the raw key (outputs are
    canonicalized via lower() and cast back to utf8_binary — a collated
    string column would also skew the cross-engine schema compare).

    Scale shape: collation support is expression-level (codegen string
    comparisons with a collator); the plan is an ordinary hash
    aggregate on the collated key — same exchange count as a binary
    group-by, no lower() materialization pass.
    """
    part = t(spark, sf, "part")
    key = F.expr("CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) "
                 "ELSE lower(p_brand) END")
    staged = part.select(
        key.alias("raw"),
        F.col("p_retailprice").cast("decimal(12,4)").alias("price"))
    ci = "collate(raw, 'UTF8_LCASE')"
    return (staged.groupBy(F.expr(f"collate(lower({ci}), 'UTF8_BINARY')")
                           .alias("brand_lc"))
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.count_distinct("raw").cast("long").alias("n_variants"),
                 F.sum(F.when(F.expr(f"{ci} = 'bRAND#33'"), 1).otherwise(0))
                 .cast("long").alias("n_eq_b33"),
                 F.sum("price").cast("double").alias("sum_price"))
            .orderBy("brand_lc"))


Q97_SQL = """
WITH staged AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
              ELSE lower(p_brand) END AS raw,
         CAST(p_retailprice AS DECIMAL(12,4)) AS price
  FROM part
)
SELECT lower(raw) AS brand_lc,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_variants,
       CAST(SUM(CASE WHEN lower(raw) = lower('bRAND#33') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eq_b33,
       CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) AS sum_price
FROM staged
GROUP BY lower(raw)
ORDER BY brand_lc
"""

ROUND9.update({
    "q97_collation_battery": (q97_collation_battery, Q97_SQL),
})

# ---------------------------------------------------------------- q98


def q98_listagg_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation via `listagg(...) WITHIN GROUP
    (ORDER BY ...)` (round-8 probe find — the ANSI form; Spark also
    aliases string_agg): per region, the comma-joined nation roster
    ascending AND pipe-joined descending, plus a larger fan-in — per
    order-priority, the '|'-joined roster of distinct return flags.
    WITHIN GROUP ordering makes the concatenation deterministic, which
    is what makes it oracle-pinnable at all (DuckDB: string_agg with
    ORDER BY inside the aggregate).

    Scale shape: listagg is an ordinary sort-based aggregate —
    map-side partials, one exchange per group-by. The return-flag leg's
    input is first collapsed to the DISTINCT (priority, flag) pairs
    (15 rows at any corpus scale) so the string build never sees the
    fact table's row count.
    """
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region")
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    roster = (nation.join(region, nation.n_regionkey == region.r_regionkey)
              .groupBy("r_name")
              .agg(F.expr("listagg(n_name, ',') WITHIN GROUP "
                          "(ORDER BY n_name)").alias("nations_asc"),
                   F.expr("listagg(n_name, '|') WITHIN GROUP "
                          "(ORDER BY n_name DESC)").alias("nations_desc"),
                   F.count("*").cast("long").alias("n_nations")))
    modes = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select("o_orderpriority", "l_returnflag").distinct()
             .groupBy("o_orderpriority")
             .agg(F.expr("listagg(l_returnflag, '|') WITHIN GROUP "
                         "(ORDER BY l_returnflag)").alias("modes")))
    return (roster.crossJoin(
        modes.agg(F.expr("listagg(modes, ';') WITHIN GROUP (ORDER BY "
                         "modes)").alias("prio_modes")))
        .select("r_name", "nations_asc", "nations_desc", "n_nations",
                "prio_modes")
        .orderBy("r_name"))


Q98_SQL = """
WITH roster AS (
  SELECT r_name,
         string_agg(n_name, ',' ORDER BY n_name) AS nations_asc,
         string_agg(n_name, '|' ORDER BY n_name DESC) AS nations_desc,
         CAST(COUNT(*) AS BIGINT) AS n_nations
  FROM nation JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
),
pm AS (
  SELECT string_agg(modes, ';' ORDER BY modes) AS prio_modes
  FROM (
    SELECT o_orderpriority,
           string_agg(l_returnflag, '|' ORDER BY l_returnflag) AS modes
    FROM (SELECT DISTINCT o_orderpriority, l_returnflag
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    GROUP BY o_orderpriority
  )
)
SELECT r_name, nations_asc, nations_desc, n_nations, prio_modes
FROM roster, pm
ORDER BY r_name
"""

ROUND9.update({
    "q98_listagg_battery": (q98_listagg_battery, Q98_SQL),
})

# ---------------------------------------------------------------- q99


def q99_variant_explode_lateral(spark: SparkSession, sf: str) -> DataFrame:
    """The `variant_explode` LATERAL table function (round-8 probe
    find) — the engine-native way to re-relationalize a variant array
    WITH positions, vs q94's `explode(variant_get(.., 'array<variant>'))`
    which loses ordinality. Build one variant doc per order (sorted
    items array), lateral-explode the items, and recover a rollup that
    NEEDS the position column (sum of qty weighted by 1-based position
    — a sequence-sensitive statistic): equality with the oracle's
    row_number-based computation proves both the values AND the
    ordinality survive the variant round trip.

    Scale shape: identical to q94 (the per-order aggregation is the
    shuffle; variant_explode is a per-row generator like explode).
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
    docs = (orders.join(items, orders.o_orderkey == items.l_orderkey)
            .select("o_orderpriority",
                    F.expr("to_variant_object(named_struct('items', items))")
                    .alias("v")))
    docs.createOrReplaceTempView("q99_docs")
    return spark.sql("""
        SELECT o_orderpriority AS prio,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(variant_get(e.value, '$.qty', 'bigint'))
                    AS BIGINT) AS sum_qty,
               CAST(SUM((e.pos + 1) * variant_get(e.value, '$.qty',
                                                  'bigint'))
                    AS BIGINT) AS sum_pos_weighted_qty
        FROM q99_docs,
             LATERAL variant_explode(variant_get(v, '$.items',
                                                 'variant')) e
        GROUP BY o_orderpriority
        ORDER BY prio
    """)


Q99_SQL = """
WITH it AS (
  SELECT l_orderkey,
         l_linenumber AS ln,
         CAST(floor(CAST(l_quantity AS DECIMAL(12,4))) AS BIGINT) AS qty
  FROM lineitem
),
ranked AS (
  -- 1-based position must mirror sort_array over the FULL struct
  -- (ln, qty): (orderkey, linenumber) is NOT unique in this corpus
  SELECT l_orderkey, qty,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY ln, qty) AS pos1
  FROM it
)
SELECT o.o_orderpriority AS prio,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(r.qty) AS BIGINT) AS sum_qty,
       CAST(SUM(r.pos1 * r.qty) AS BIGINT) AS sum_pos_weighted_qty
FROM ranked r JOIN orders o ON o.o_orderkey = r.l_orderkey
GROUP BY 1
ORDER BY 1
"""

ROUND9.update({
    "q99_variant_explode_lateral": (q99_variant_explode_lateral, Q99_SQL),
})

# ---------------------------------------------------------------- d65


def d65_holdout_calibrated_thresholds(spark: SparkSession,
                                      sf: str) -> DataFrame:
    """d62 x d63 composition — per-language calibrated keep-thresholds
    computed from HELD-OUT scores only: the split model (d63, trained
    on the 80% train half) scores the 20% holdout, and each language's
    knife is placed on those unseen-data scores. This is the
    production-correct calibration order — placing the knife on
    training-set scores (d62's shape, fine there because d60's model
    is the corpus-wide artifact) overstates post-deployment yield
    whenever the model memorizes (d63's gate shows train keep-rates of
    100% vs holdout 62% at sf0.01 — exactly the optimism this removes).

    Same grid and target as d62; the oracle re-derives everything
    (split training included) in SQL. Scale shape: d63's two passes
    plus d62's constant-size grid machinery; the holdout filter is a
    per-row hash pushed into the scan projection.
    """
    from etl_docker_spark.plans.round7 import _D61_CELLS, classifier_occ_frame
    from etl_docker_spark.plans.round8 import (_D62_GRID_LO, _D62_GRID_W,
                                               _D62_KEEP_TARGET_PCT,
                                               d63_weights_frame)

    weights = d63_weights_frame(spark, sf)
    # lang and n_tokens ride the shared occurrence frame and the per-doc
    # groupBy (the d60_scores_frame shape) — no second documents scan
    occ = (classifier_occ_frame(spark, sf)
           .filter(F.col("split") == "holdout")
           .select("doc_id", "lang", "n_tokens", "bucket"))
    scored = (occ.join(F.broadcast(weights), "bucket", "left")
              .groupBy("doc_id", "lang", "n_tokens")
              .agg(F.count("*").cast("long").alias("n_feats"),
                   F.sum(F.coalesce(F.col("w_ppm"), F.lit(0)))
                   .cast("long").alias("sum_ppm")))
    per_doc = scored.select("lang", "n_tokens",
                            F.expr("sum_ppm DIV n_feats").alias("score_ppm"))
    cell_w = _D62_GRID_W * 1.0 / _D61_CELLS
    cell = F.least(F.greatest(
        F.floor((F.col("score_ppm") - _D62_GRID_LO) / cell_w), F.lit(0)),
        F.lit(_D61_CELLS - 1)).cast("long")
    hist = (per_doc.select("lang", cell.alias("hcell"), "n_tokens")
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


def _d65_sql() -> str:
    from etl_docker_spark.plans.round2f import _MIN_TOKENS
    from etl_docker_spark.plans.round6 import _D58_BUCKETS
    from etl_docker_spark.plans.round7 import (_D60_FEATS_DUCK, _D60_SCALE,
                                               _D61_CELLS)
    from etl_docker_spark.plans.round8 import (_D62_GRID_LO, _D62_GRID_W,
                                               _D62_KEEP_TARGET_PCT,
                                               _D63_TRAIN_PCT)
    return rf"""
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
              ELSE 1 END AS y0,
         CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) % 100
                   < {_D63_TRAIN_PCT}
              THEN 'train' ELSE 'holdout' END AS split,
         {_D60_FEATS_DUCK} AS feats
  FROM documents
),
lab AS (
  SELECT doc_id, lang, n_tokens, split, feats,
         CASE WHEN y0 = 0 THEN 0
              WHEN row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) > 1 THEN 0
              ELSE 1 END AS y
  FROM labeled
),
occ AS (
  SELECT doc_id, lang, n_tokens, split, y,
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
  SELECT o.doc_id, any_value(o.lang) AS lang,
         any_value(o.n_tokens) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(COALESCE(w.w_ppm, 0)) AS BIGINT) AS sum_ppm
  FROM occ o LEFT JOIN w USING (bucket)
  WHERE o.split = 'holdout'
  GROUP BY o.doc_id
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


ROUND9.update({
    "d65_holdout_calibrated_thresholds": (d65_holdout_calibrated_thresholds,
                                          _d65_sql()),
})
