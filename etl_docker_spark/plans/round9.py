"""Round-9 STAGED queries — written and oracle-verified in round 8,
deliberately NOT yet imported by the registry: round 8's committed
artifacts (CORRECTNESS_full_r8 / PLANS.md / BENCH_QUERIES / BENCH_SF1)
were regenerated at the 222-query surface, and registering more after
the fact would desynchronize every artifact count (the round-5 lesson,
applied successfully for q95 in rounds 7->8). Round 9 registers this
module first thing, then regenerates.

Round-8 probe findings these build on (tests in tests/test_round8.py
pin the primitives): collations are live (UTF8_LCASE / UNICODE_CI_AI;
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
