"""Round-2 tenth batch: the remaining classic TPC-H join/aggregate shapes,
a bounded-degree graph triangle count, a Count-Min frequency sketch, and
scalar-quantized (int8) vector search.

- q48: TPC-H Q7 shape (volume shipping) — revenue between two nations by
  ship year, both directions. The canonical multi-dim star join whose plan
  quality is all about WHERE the dimension filters land.
- q49: TPC-H Q8 shape (market share) — one supplier nation's share of a
  region's market by order year, in exact parts-per-million fixed point
  (integer cross-engine arithmetic; no decimal-division rounding to
  disagree on).
- q50: TPC-H Q11 shape (important stock) — parts whose lineitem value
  exceeds 1.2x the average part value, compared by exact integer
  cross-multiplication against a broadcast global scalar.
- g02: triangle count over the MUTUAL top-K co-trade graph. The top-K
  construction bounds every node's degree by K at ANY corpus size, so the
  wedge join is O(K^2 * nodes) — a triangle count that survives 100 TB by
  design, not by luck (an unthresholded co-occurrence graph goes dense and
  quadratic as replicas accumulate).
- d32: Count-Min sketch over document tokens + heavy-hitter estimates.
  Completes the mergeable-sketch family (d16 KMV, d28 HLL): 4x256 integer
  registers, md5-derived bucket hashes, est >= truth by construction.
- e13: scalar-quantization (SQ8) ANN — per-dimension min/max train an
  8-bit codebook (64 bytes/vector, 4x smaller than raw float32);
  asymmetric search scores raw queries against reconstructed corpus codes
  in exact integer arithmetic. The third compression point on the
  recall/size curve beside PQ (e09/e10) and IVFPQ (e11).

Determinism discipline as everywhere (plans/_util.py): decimal-exact money
sums, integer fixed point wherever a ratio or a quantizer appears, md5 as
the only hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import RATE, dec, rate, t

# ---------------------------------------------------------------- q48

_Q48_N1, _Q48_N2 = "NATION_1", "NATION_2"


def q48_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two nations (both
    directions), by ship year.

    Plan shape: nation is broadcast into supplier/customer; the
    nation-filtered supplier (2/25 of a small dim) is broadcast into
    lineitem BEFORE the lineitem-orders shuffle join, so only ~8% of
    lineitem rows pay the big shuffle. The customer side is left to AQE —
    at 100 TB a 2/25 customer slice is too big to broadcast and becomes
    the probe side of the orders join; at bench SF AQE broadcasts it.
    The shipdate filter is pushed to the parquet scan.
    """
    nat = t(spark, sf, "nation").filter(F.col("n_name").isin(_Q48_N1, _Q48_N2))
    supp = (t(spark, sf, "supplier")
            .join(F.broadcast(nat.select("n_nationkey",
                                         F.col("n_name").alias("supp_nation"))),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "supp_nation"))
    cust = (t(spark, sf, "customer")
            .join(F.broadcast(nat.select(F.col("n_nationkey").alias("cnk"),
                                         F.col("n_name").alias("cust_nation"))),
                  F.col("c_nationkey") == F.col("cnk"))
            .select("c_custkey", "cust_nation"))
    li = (t(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1999-01-01"))
                  & (F.col("l_shipdate") < F.lit("2001-01-01")))
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate"))
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    j = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, F.col("o_custkey") == cust.c_custkey)
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    price, disc = dec("l_extendedprice"), rate("l_discount")
    one = F.lit(1).cast(RATE)
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


Q48_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                     * (CAST(1 AS DECIMAL(6,4))
                        - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('{_Q48_N1}', '{_Q48_N2}')
  AND nc.n_name IN ('{_Q48_N1}', '{_Q48_N2}')
  AND ns.n_name <> nc.n_name
  AND l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate <  TIMESTAMP '2001-01-01'
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------- q49

_Q49_REGION = "ASIA"
_Q49_NATION = "NATION_7"  # in ASIA (regionkey = nationkey % 5 = 2)

# Exact scale-4 fixed-point line revenue: price_i * (1 - disc) without ever
# leaving BIGINT. Identical integer ops on both engines => identical values;
# the div-10000 rescale happens per line so year-level sums stay far inside
# BIGINT at any bench multiple.
_REV_I4 = ("(CAST(CAST({p} AS DECIMAL(18,4)) * 10000 AS BIGINT)"
           " * (10000 - CAST(CAST({d} AS DECIMAL(6,4)) * 10000 AS BIGINT)))"
           " {div} 10000")


def _rev_i4_col() -> F.Column:
    return F.expr(_REV_I4.format(p="l_extendedprice", d="l_discount",
                                 div="div"))


def q49_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7 suppliers' share of the ASIA customer
    market by order year, as exact ppm.

    The share is (nation revenue * 1e6) div (total revenue) over scale-4
    fixed-point sums — promoted to DECIMAL(38,0) for the multiply so the
    integral division is exact at any scale factor. Engine decimal
    DIVISION is never used: its result scale/rounding differs engine to
    engine, and a half-ulp flips a ppm.

    Plan: region->nation->customer chain collapses to a broadcast filter
    on orders; supplier nation rides a broadcast into lineitem; one
    shuffle joins the two fact slices; the year groupBy is map-side
    combined to a handful of rows.
    """
    nat = t(spark, sf, "nation")
    reg = t(spark, sf, "region").filter(F.col("r_name") == _Q49_REGION)
    asia_nat = (nat.join(F.broadcast(reg),
                         nat.n_regionkey == reg.r_regionkey)
                .select("n_nationkey"))
    cust = (t(spark, sf, "customer")
            .join(F.broadcast(asia_nat),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey"))
    orders = (t(spark, sf, "orders")
              .join(cust, F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "o_orderdate"))
    supp = (t(spark, sf, "supplier")
            .join(F.broadcast(nat.select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_i4_col().alias("rev_i4"))
    j = (li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(orders, F.col("l_orderkey") == F.col("o_orderkey")))
    agg = (j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
           .agg(F.sum(F.when(F.col("supp_nation") == _Q49_NATION,
                             F.col("rev_i4")).otherwise(F.lit(0)))
                .alias("nation_rev_i4"),
                F.sum("rev_i4").alias("total_rev_i4")))
    return agg.select(
        "o_year", "nation_rev_i4", "total_rev_i4",
        F.expr("(CAST(nation_rev_i4 AS DECIMAL(38,0)) * 1000000)"
               " div total_rev_i4").alias("share_ppm"))


Q49_SQL = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year, ns.n_name AS supp_nation,
         {_REV_I4.format(p="l_extendedprice", d="l_discount", div="//")}
           AS rev_i4
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{_Q49_REGION}'
),
agg AS (
  SELECT CAST(o_year AS BIGINT) AS o_year,
         SUM(CASE WHEN supp_nation = '{_Q49_NATION}' THEN rev_i4
                  ELSE 0 END) AS nation_rev_i4,
         SUM(rev_i4) AS total_rev_i4
  FROM j GROUP BY 1
)
SELECT o_year, CAST(nation_rev_i4 AS BIGINT) AS nation_rev_i4,
       CAST(total_rev_i4 AS BIGINT) AS total_rev_i4,
       CAST((CAST(nation_rev_i4 AS HUGEINT) * 1000000)
            // CAST(total_rev_i4 AS HUGEINT) AS BIGINT) AS share_ppm
FROM agg
"""

# ---------------------------------------------------------------- q50


def q50_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total lineitem value exceeds 1.2x the
    average part value — a grouped aggregate HAVING-compared against a
    global scalar.

    The compare is exact integer cross-multiplication
    (value * n_parts * 10 > total * 12) in DECIMAL(38,0): no division, no
    rounding mode to disagree on, valid at any scale factor. The scalar
    (total, n_parts) is one extra reduce over the already-grouped frame
    and rides a 1-row broadcast — the per-part frame is scanned once,
    never recomputed from the fact.
    """
    per_part = (t(spark, sf, "lineitem")
                .select("l_partkey", _rev_i4_col().alias("rev_i4"))
                .groupBy("l_partkey")
                .agg(F.sum("rev_i4").alias("part_value_i4"),
                     F.count("*").alias("n_lines"))
                .localCheckpoint())
    totals = per_part.agg(F.sum("part_value_i4").alias("tot"),
                          F.count("*").alias("n_parts"))
    return (per_part.crossJoin(F.broadcast(totals))
            .filter(F.expr("CAST(part_value_i4 AS DECIMAL(38,0))"
                           " * n_parts * 10 > CAST(tot AS DECIMAL(38,0))"
                           " * 12"))
            .select("l_partkey", "part_value_i4", "n_lines"))


Q50_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         SUM({_REV_I4.format(p="l_extendedprice", d="l_discount", div="//")})
           AS part_value_i4,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(part_value_i4) AS tot, COUNT(*) AS n_parts FROM per_part)
SELECT l_partkey, CAST(part_value_i4 AS BIGINT) AS part_value_i4, n_lines
FROM per_part, tot
WHERE CAST(part_value_i4 AS HUGEINT) * n_parts * 10
      > CAST(tot AS HUGEINT) * 12
"""

# ---------------------------------------------------------------- g02

_G02_K = 8


def cotrade_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The mutual top-K co-trade edge set (a < b), memoized per session —
    g02 (triangles) and g03 (recursive hop distances) walk the same
    graph, and the distinct+co-pair construction is its whole cost."""
    from etl_docker_spark.llm.index_cache import memo_frame

    def build() -> DataFrame:
        os_ = (t(spark, sf, "lineitem")
               .select("l_orderkey", "l_suppkey").distinct())
        pairs = (os_.alias("x")
                 .join(os_.alias("y"),
                       on=[F.col("x.l_orderkey") == F.col("y.l_orderkey"),
                           F.col("x.l_suppkey") < F.col("y.l_suppkey")])
                 .groupBy(F.col("x.l_suppkey").alias("s1"),
                          F.col("y.l_suppkey").alias("s2"))
                 .agg(F.count("*").alias("n")))
        directed = pairs.unionAll(
            pairs.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"),
                         "n"))
        w = Window.partitionBy("s1").orderBy(F.desc("n"), F.asc("s2"))
        top = (directed.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= _G02_K).select("s1", "s2"))
        mutual = top.intersect(top.select(F.col("s2").alias("s1"),
                                          F.col("s1").alias("s2")))
        return (mutual.filter(F.col("s1") < F.col("s2"))
                .select(F.col("s1").alias("a"), F.col("s2").alias("b")))

    return memo_frame(spark, f"cotrade_edges:{sf}", build, sf_dir=sf)


def g02_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle count over the mutual top-K co-trade graph.

    Graph: suppliers are nodes; each keeps its K strongest co-order
    partners (by co-occurrence count, ties by partner id); an undirected
    edge exists iff BOTH endpoints selected each other. The top-K step is
    what makes a triangle count survive 100 TB: raw co-occurrence graphs
    go DENSE as data accumulates (at 10x bench scale nearly every supplier
    pair has co-traded), and wedge enumeration on a dense graph is
    Theta(N^3). Mutual-kNN bounds every degree by K, so wedges are at most
    C(K,2) per node — linear in nodes forever.

    Plan: one shuffle builds co-occurrence counts from the distinct
    (order, supplier) projection; the top-K window shares that
    partitioning; the edge set (<= K*N/2 rows of two longs) is
    checkpointed once and feeds the two wedge sides and the closing-edge
    probe. Each triangle is counted at its lowest vertex exactly once.
    """
    edges = cotrade_edges(spark, sf)
    tri = (edges.alias("e1")
           .join(edges.alias("e2"), F.col("e1.a") == F.col("e2.a"))
           .filter(F.col("e1.b") < F.col("e2.b"))
           .join(edges.alias("e3"),
                 (F.col("e3.a") == F.col("e1.b"))
                 & (F.col("e3.b") == F.col("e2.b")))
           .agg(F.count("*").alias("n_triangles")))
    nodes = (edges.select(F.col("a").alias("v"))
             .unionAll(edges.select(F.col("b").alias("v")))
             .agg(F.count_distinct("v").alias("n_nodes")))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (nodes.crossJoin(F.broadcast(n_edges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles"))


G02_SQL = f"""
WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT x.l_suppkey AS s1, y.l_suppkey AS s2, COUNT(*) AS n
  FROM os x JOIN os y
    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
  GROUP BY 1, 2
),
directed AS (
  SELECT s1, s2, n FROM pairs
  UNION ALL SELECT s2, s1, n FROM pairs
),
top AS (
  SELECT s1, s2 FROM (
    SELECT s1, s2,
           row_number() OVER (PARTITION BY s1 ORDER BY n DESC, s2) AS rn
    FROM directed) WHERE rn <= {_G02_K}
),
edges AS (
  SELECT s1 AS a, s2 AS b
  FROM (SELECT s1, s2 FROM top
        INTERSECT SELECT s2 AS s1, s1 AS s2 FROM top)
  WHERE s1 < s2
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
),
nn AS (
  SELECT COUNT(DISTINCT v) AS n_nodes
  FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
),
ne AS (SELECT COUNT(*) AS n_edges FROM edges)
SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri
"""

# ---------------------------------------------------------------- d32

_CMS_W = 256
_CMS_D = 4
_CMS_TOPK = 20


def d32_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min sketch over document tokens + heavy-hitter estimates.

    The third mergeable sketch beside KMV (d16) and HLL (d28): _CMS_D rows
    of _CMS_W integer registers, bucket = md5("cms<d>_" || token) mod W,
    register = SUM of token occurrences — registers merge across corpus
    shards by plain addition, the property that makes the sketch a
    map-side-combinable aggregate at 100 TB (4*256 cells total, no matter
    the token cardinality). The estimate for a token is the MIN over its D
    registers, >= truth by construction.

    The gate output pairs the top-20 true counts (the expensive exact
    groupBy a production sketch exists to avoid — here it doubles as the
    measurement) with their sketch estimates; the token-count frame is
    checkpointed so the corpus tokenization pass runs once for both.
    """
    toks = (t(spark, sf, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok")))
    counts = (toks.groupBy("tok").agg(F.count("*").alias("n"))
              .localCheckpoint())
    dseries = F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)])).alias("d")

    def bucket(tok: F.Column, d: F.Column) -> F.Column:
        digest = F.md5(F.concat(F.lit("cms"), d.cast("string"), F.lit("_"),
                                tok).cast("binary"))
        return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
                % _CMS_W)

    regs = (counts.select("tok", "n", dseries)
            .select("d", bucket(F.col("tok"), F.col("d")).alias("b"), "n")
            .groupBy("d", "b").agg(F.sum("n").alias("reg")))
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(_CMS_TOPK)
    probes = (top.select("tok", "n", dseries)
              .select("tok", "n", "d",
                      bucket(F.col("tok"), F.col("d")).alias("b")))
    return (probes.join(F.broadcast(regs), ["d", "b"])
            .groupBy("tok", F.col("n").alias("true_n"))
            .agg(F.min("reg").alias("est_n")))


D32_SQL = f"""
WITH counts AS (
  SELECT tok, COUNT(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
rowsd AS (
  SELECT tok, n, d
  FROM counts, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d)
),
regs AS (
  SELECT d,
         CAST('0x' || substring(md5('cms' || CAST(d AS VARCHAR) || '_'
                                    || tok), 1, 8) AS BIGINT)
           % {_CMS_W} AS b,
         SUM(n) AS reg
  FROM rowsd GROUP BY 1, 2
),
top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT {_CMS_TOPK}),
probes AS (
  SELECT tok, n, d,
         CAST('0x' || substring(md5('cms' || CAST(d AS VARCHAR) || '_'
                                    || tok), 1, 8) AS BIGINT)
           % {_CMS_W} AS b
  FROM top, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d)
)
SELECT tok, n AS true_n, CAST(MIN(reg) AS BIGINT) AS est_n
FROM probes JOIN regs USING (d, b)
GROUP BY tok, n
"""

# ---------------------------------------------------------------- e13

_SQ_NQ = 8
_SQ_K = 5
_SQ_Q = 1024


def e13_sq8_search(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-quantization (SQ8) ANN search in exact integer arithmetic.

    Train: per-dimension min/max over floor-quantized components (64 rows,
    one map-side-combined aggregate) define an 8-bit code per component —
    the 4x-compression point below PQ's 64x (e09). Search: asymmetric —
    the raw query hits RECONSTRUCTED corpus values
    (mn + code*(mx-mn) div 255), scored by integer dot product, so
    quantization error stays one-sided on the corpus.

    Every step is positive-operand integer division — bit-identical in any
    engine, which is what puts an ANN *index* under a value-hash gate.
    Plan: stats broadcast into the code pass; queries (8 vectors) broadcast
    into the scoring join; one (query, corpus) shuffle for the score
    aggregate; top-k by window, ties broken by id.
    """
    emb = t(spark, sf, "embeddings")
    comps = (emb.select(F.col("vec_id").alias("id"),
                        F.posexplode("embedding").alias("pos", "val"))
             .select("id", (F.col("pos") + 1).alias("d"),
                     F.floor(F.col("val").cast("double") * _SQ_Q)
                     .cast("long").alias("qd")))
    stats = comps.groupBy("d").agg(F.min("qd").alias("mn"),
                                   F.max("qd").alias("mx"))
    recon = (comps.join(F.broadcast(stats), "d")
             .select("id", "d",
                     F.expr("mn + ((((qd - mn) * 255)"
                            " div greatest(mx - mn, 1)) * (mx - mn))"
                            " div 255").alias("r")))
    q = (comps.filter(F.col("id") < _SQ_NQ)
         .select(F.col("id").alias("qid"), "d", F.col("qd").alias("q_qd")))
    scored = (recon.join(F.broadcast(q), "d")
              .filter(F.col("id") != F.col("qid"))
              .groupBy("qid", "id")
              .agg(F.sum(F.col("q_qd") * F.col("r")).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _SQ_K)
            .select(F.col("qid").alias("query_id"),
                    F.col("id").alias("neighbor_id"), "score", "rank"))


E13_SQL = f"""
WITH comps AS (
  SELECT vec_id AS id, d,
         CAST(floor(CAST(embedding[d] AS DOUBLE) * {_SQ_Q}) AS BIGINT) AS qd
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d)
),
stats AS (SELECT d, MIN(qd) AS mn, MAX(qd) AS mx FROM comps GROUP BY d),
recon AS (
  SELECT id, comps.d,
         mn + ((((qd - mn) * 255) // greatest(mx - mn, 1)) * (mx - mn))
              // 255 AS r
  FROM comps JOIN stats USING (d)
),
q AS (SELECT id AS qid, d, qd AS q_qd FROM comps WHERE id < {_SQ_NQ}),
scored AS (
  SELECT qid, id, CAST(SUM(q_qd * r) AS BIGINT) AS score
  FROM recon JOIN q USING (d)
  WHERE id <> qid
  GROUP BY qid, id
),
ranked AS (
  SELECT qid AS query_id, id AS neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY qid
                                 ORDER BY score DESC, id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, score, rank FROM ranked
WHERE rank <= {_SQ_K}
"""


ROUND2J = {
    "q48_volume_shipping": (q48_volume_shipping, Q48_SQL),
    "q49_market_share": (q49_market_share, Q49_SQL),
    "q50_important_parts": (q50_important_parts, Q50_SQL),
    "g02_triangle_count": (g02_triangle_count, G02_SQL),
    "d32_cms_heavy_hitters": (d32_cms_heavy_hitters, D32_SQL),
    "e13_sq8_search": (e13_sq8_search, E13_SQL),
}
