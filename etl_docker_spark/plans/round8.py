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
        F.struct(
            F.col("l_linenumber").cast("int").alias("ln"),
            F.col("l_quantity").cast("decimal(12,4)").cast("bigint")
            .alias("qty")).alias("it"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("it")).alias("items")))
    docs = (orders.join(items, orders.o_orderkey == items.l_orderkey)
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
         CAST(CAST(l_quantity AS DECIMAL(12,4)) AS BIGINT) AS qty
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
