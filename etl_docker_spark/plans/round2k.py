"""Round-2 eleventh batch: semantic deduplication over the trained
clustering, and a multi-dimensional Z-order (Morton) layout.

- d33: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — deduplicate by
  SEMANTIC similarity: k-means-cluster the embedding space (e05's trained
  quantizer), compare pairs only within a cluster, and keep one
  representative per near-duplicate relation. The embedding-space
  complement to the text-space dedup family (d01/d06/d07): catches
  paraphrases and re-encodings exact/shingle methods can't see.
- q51: Z-order cell layout — interleave the bits of two quantized join
  keys into a Morton code and report per-cell zone stats. The
  multi-dimensional complement to q43's 1-D range zones: a fact laid out
  by Z-value keeps BOTH keys' min/max tight per file, so scans filtered
  on EITHER key prune — the layout trick behind Delta/Iceberg OPTIMIZE
  ZORDER. Cell assignment is pure integer arithmetic per row (no global
  sort anywhere).

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d33

_SEM_T = 0.93     # within-cluster cosine threshold
# Hot-cluster refinement cap: the within-cluster self-join is quadratic in
# occupancy, and a k=8 quantizer's cells grow linearly with the corpus —
# measured 809 s at ~sf1 (20k vectors, ~2.5k/cell) without a cap. Clusters
# above the cap sub-bucket on floor-grid dims one at a time (e02's
# _refined_cells, ONE rollup pass + broadcast hot flags). MUST stay above
# the gate corpora's max cluster occupancy (74 at sf0.001/sf0.01) so the
# oracle's plain within-cluster form stays bit-identical there; larger
# corpora trade boundary-pair recall for linear cost — the same documented
# ANN trade as e02. (At true scale you'd ALSO retrain with k ~ N/1k; the
# cap is what makes a FIXED trained quantizer safe to serve.)
_SEM_CAP = 128
_SEM_REFINE_DIMS = (1, 2, 3, 4)


def d33_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup: per k-means cluster, drop every vector that has a
    LOWER-id within-cluster neighbor with cosine >= _SEM_T; keep the rest.

    Output: (vec_id, cluster, kept) for the whole corpus — the curation
    verdict a pipeline joins back onto documents. Deterministic keep rule
    (min-id representative of the similarity relation) instead of the
    paper's random choice, so the gate can pin values.

    Scale shape: the quadratic compare is confined to k-means cells,
    sub-bucketed past _SEM_CAP occupancy (see above); assignments ride
    one id-equi join onto the vectors; the within-cell self-join shuffles
    on the effective cell key; losers (a distinct id set, tiny relative
    to the corpus) broadcast into an anti-join-shaped left join.
    """
    from etl_docker_spark.llm.similarity import (_refined_cells, bucket_expr,
                                                 dot_expr, norm2_expr)
    from etl_docker_spark.plans.round2 import e05_assignments

    assign = e05_assignments(spark, sf)
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm2_expr(F.col("embedding")).alias("n2"))
    keyed = (e.join(assign, "vec_id")
             .select("vec_id", "embedding", "n2", "cluster",
                     F.col("cluster").alias("b1"),
                     F.lit(0).cast("long").alias("b2"),
                     *[bucket_expr(F.col("embedding"), d).alias(f"c{i + 1}")
                       for i, d in enumerate(_SEM_REFINE_DIMS)]))
    ea = (_refined_cells(keyed, _SEM_CAP, len(_SEM_REFINE_DIMS))
          .select("vec_id", "embedding", "n2", "cluster", "cell")
          .localCheckpoint())
    a, b = ea.alias("a"), ea.alias("b")
    pairs = (a.join(b, on=[F.col("a.cell") == F.col("b.cell"),
                           F.col("a.vec_id") < F.col("b.vec_id")])
             .select(F.col("b.vec_id").alias("loser"),
                     (dot_expr(F.col("a.embedding"), F.col("b.embedding"))
                      / F.sqrt(F.col("a.n2") * F.col("b.n2")))
                     .alias("cosine")))
    losers = (pairs.filter(F.col("cosine") >= _SEM_T)
              .select("loser").distinct())
    return (ea.join(F.broadcast(losers),
                    ea.vec_id == losers.loser, "left")
            .select("vec_id", "cluster",
                    F.col("loser").isNull().alias("kept")))


def _d33_sql() -> str:
    from etl_docker_spark.plans.round2 import _E05_BODY, _DOT2

    return f"""
WITH {_E05_BODY.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
emb AS (
  SELECT vec_id, embedding,
         {_DOT2.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
ea AS (SELECT emb.*, assign.cluster FROM emb JOIN assign USING (vec_id)),
losers AS (
  SELECT DISTINCT b.vec_id AS loser
  FROM ea a JOIN ea b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_DOT2.format(a='a.embedding', b='b.embedding')}
          / sqrt(a.n2 * b.n2) >= {_SEM_T}
)
SELECT ea.vec_id, ea.cluster, l.loser IS NULL AS kept
FROM ea LEFT JOIN losers l ON ea.vec_id = l.loser
"""


# ---------------------------------------------------------------- q51

_Z_BITS = 4  # per-dimension grid bits -> 2^(2*_Z_BITS) Morton cells


def q51_zorder_cells(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order layout cells for lineitem on (l_partkey, l_suppkey): each
    key quantizes to a _Z_BITS-bit grid coordinate (key * 2^bits div
    (max+1) — integer, rank-preserving), the two coordinates interleave
    into a Morton code, and each cell reports the zone stats a planner
    would read (row count, min/max of both keys).

    Why Morton and not sort-by-one-key: a partkey-sorted layout gives
    suppkey zones the FULL key range in every file (no pruning on
    suppkey); Z-interleave bounds both dimensions at once, so predicates
    on either key skip ~(1 - 1/2^bits) of cells. Cell id is per-row
    integer arithmetic against two broadcast max-scalars — no global sort,
    no ntile; at 100 TB this is a map-only pass feeding a
    partitionBy(cell) write.
    """
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(F.max("l_partkey").alias("pmax"),
                F.max("l_suppkey").alias("smax"))
    g = 1 << _Z_BITS
    cells = (li.crossJoin(F.broadcast(mx))
             .select("l_partkey", "l_suppkey",
                     F.expr(f"(l_partkey * {g}) div (pmax + 1)").alias("px"),
                     F.expr(f"(l_suppkey * {g}) div (smax + 1)").alias("sy")))
    z = None
    for i in range(_Z_BITS):
        term = (F.shiftright("px", i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
                + F.shiftright("sy", i).bitwiseAND(F.lit(1))
                * (1 << (2 * i + 1)))
        z = term if z is None else z + term
    return (cells.withColumn("zcell", z.cast("long"))
            .groupBy("zcell")
            .agg(F.count("*").alias("n_rows"),
                 F.min("l_partkey").alias("min_partkey"),
                 F.max("l_partkey").alias("max_partkey"),
                 F.min("l_suppkey").alias("min_suppkey"),
                 F.max("l_suppkey").alias("max_suppkey")))


def _q51_zterm_sql() -> str:
    terms = [
        f"(((px >> {i}) & 1) * {1 << (2 * i)}"
        f" + ((sy >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(_Z_BITS)
    ]
    return " + ".join(terms)


Q51_SQL = f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS pmax, MAX(l_suppkey) AS smax FROM lineitem
),
cells AS (
  SELECT l_partkey, l_suppkey,
         (l_partkey * {1 << _Z_BITS}) // (pmax + 1) AS px,
         (l_suppkey * {1 << _Z_BITS}) // (smax + 1) AS sy
  FROM lineitem, mx
)
SELECT CAST({_q51_zterm_sql()} AS BIGINT) AS zcell,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey,
       MIN(l_suppkey) AS min_suppkey, MAX(l_suppkey) AS max_suppkey
FROM cells GROUP BY 1
"""


ROUND2K = {
    "d33_semdedup": (d33_semdedup, _d33_sql()),
    "q51_zorder_cells": (q51_zorder_cells, Q51_SQL),
}
