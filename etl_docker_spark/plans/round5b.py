"""Round-5b queries: the second half of round 5.

Three of these gate engine features that probing this round showed are
NATIVE in this Spark 4.1 build (the round-4/5 probe discipline paying
again, after recursive CTEs and the state data source): SQL pipe syntax
(q88), session variables + EXECUTE IMMEDIATE (q89), and SQL scripting
control flow (q90). q91 gates the Python UDTF path with partitioned
TABLE arguments — the one Arrow-batched escape hatch family the surface
didn't exercise yet. d56 turns the memoized exact-Jaccard pair graph
into the cross-source leakage matrix a curation team actually reads,
and e22 adds matryoshka (prefix-dimension) two-stage retrieval to the
ANN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import session_conf, t

ROUND5B: dict = {}

# ---------------------------------------------------------------- q88

# Integer-cents idiom shared by both engines: DECIMAL(12,4) * 100 is an
# exact integral value, so the BIGINT cast is lossless in Spark and
# DuckDB alike (same shape as q87's bal_cents).
_CENTS = "CAST(CAST({col} AS DECIMAL(12,4)) * 100 AS BIGINT)"


def q88_pipe_syntax(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (|>), native in Spark 4.x: the same
    filter -> join -> aggregate -> project chain every DataFrame query
    in this repo writes, expressed as a linear pipe instead of nested
    SQL. This gates the PARSER feature, not a new engine path — each
    pipe operator lowers onto the identical Catalyst operators
    (`|> WHERE` before the join still pushes to the parquet scan,
    `|> AGGREGATE` is the same partial/final hash aggregate), so the
    100 TB plan is exactly the one q01/q02 already audited. Revenue
    cents stay integer end-to-end (DECIMAL(12,4)*100 -> BIGINT, the
    q87 idiom) so the oracle comparison is exact, not float-shaped.
    """
    t(spark, sf, "lineitem").createOrReplaceTempView("q88_lineitem")
    t(spark, sf, "orders").createOrReplaceTempView("q88_orders")
    rev = _CENTS.format(col="l_extendedprice")
    return spark.sql(f"""
FROM q88_lineitem
|> WHERE l_quantity >= 30
|> JOIN q88_orders ON l_orderkey = o_orderkey
|> AGGREGATE
     CAST(SUM({rev}) AS BIGINT) AS rev_cents,
     CAST(COUNT(*) AS BIGINT) AS n_items,
     CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
   GROUP BY o_orderpriority
|> EXTEND CAST(rev_cents DIV n_orders AS BIGINT) AS cents_per_order
|> ORDER BY o_orderpriority
|> SELECT o_orderpriority, rev_cents, n_items, n_orders, cents_per_order
""")


Q88_SQL = f"""
SELECT o_orderpriority,
       CAST(SUM({_CENTS.format(col="l_extendedprice")}) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM({_CENTS.format(col="l_extendedprice")})
            // COUNT(DISTINCT o_orderkey) AS BIGINT) AS cents_per_order
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 30
GROUP BY o_orderpriority
"""

ROUND5B.update({
    "q88_pipe_syntax": (q88_pipe_syntax, Q88_SQL),
})

# ---------------------------------------------------------------- q89


def q89_session_variables(spark: SparkSession, sf: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE (both native in Spark 4.x):
    the incremental-pull parameterization pattern q70 builds with
    DataFrame code, expressed at the SQL layer — a cutoff computed into
    a session variable (`SET VAR ... = (scalar subquery)`), then a
    parameterized statement executed with EXECUTE IMMEDIATE combining
    the variable (resolved by name inside the string) with a USING
    bind parameter. This is how a SQL-only orchestration layer (the
    audit/bookmark machinery of `orchestration.py`) would drive the
    same relative-date window without any Python in the loop.

    Scale shape: the cutoff subquery is one MAX aggregate; the main
    statement is a scan filtered by two pushable predicates — the
    variable and the bind both fold to literals at plan time, so the
    parquet scan sees plain `>` / `=` pushdown.
    """
    t(spark, sf, "orders").createOrReplaceTempView("q89_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE q89_cutoff TIMESTAMP")
    spark.sql("SET VAR q89_cutoff = (SELECT MAX(o_orderdate) - INTERVAL '90' DAY"
              " FROM q89_orders)")
    cents = _CENTS.format(col="o_totalprice")
    return spark.sql(f"""
EXECUTE IMMEDIATE
  'SELECT o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM({cents}) AS BIGINT) AS total_cents
   FROM q89_orders
   WHERE o_orderdate > q89_cutoff AND o_orderstatus = :st
   GROUP BY o_orderpriority'
  USING 'O' AS st
""")


Q89_SQL = f"""
WITH cut AS (SELECT MAX(o_orderdate) - INTERVAL 90 DAY AS c FROM orders)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_CENTS.format(col="o_totalprice")}) AS BIGINT) AS total_cents
FROM orders, cut
WHERE o_orderdate > cut.c AND o_orderstatus = 'O'
GROUP BY o_orderpriority
"""

ROUND5B.update({
    "q89_session_variables": (q89_session_variables, Q89_SQL),
})

# ---------------------------------------------------------------- q90


def q90_sql_scripting(spark: SparkSession, sf: str) -> DataFrame:
    """SQL scripting (BEGIN/DECLARE/WHILE/IF, native in Spark 4.x):
    bisection for the revenue-median quantity threshold — the smallest
    quantity k such that lineitems with l_quantity <= k carry at least
    half of total revenue. The script runs ~log2(50) = 6 scan+aggregate
    iterations with loop state in script-local variables; every
    comparison is integer cents, so the loop's decisions are exact and
    engine-independent.

    The docstring point is the CONTRAST, stated honestly: the oracle
    computes the same threshold DECLARATIVELY in one pass (cumulative
    window over per-quantity revenue) — at 100 TB you run that one-scan
    formulation, and q14/q40 already gate it. Scripting is the tool for
    control flow that genuinely depends on prior results (convergence
    loops, conditional DDL, retry ladders — the `orchestration.py`
    territory), and this query pins that the engine's procedural layer
    computes the same answer as its declarative one.
    """
    li = t(spark, sf, "lineitem")
    # materialize the 16-byte (qty, cents) projection ONCE before the
    # loop: the script's ~log2(50)+2 aggregate iterations otherwise each
    # re-scan and re-project the parquet fact table — a convergence loop
    # should iterate over the narrow working set, not the source scan
    li.select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
    ).localCheckpoint().createOrReplaceTempView("q90_li")
    return spark.sql("""
BEGIN
  DECLARE lo BIGINT DEFAULT 1;
  DECLARE hi BIGINT DEFAULT 50;
  DECLARE mid BIGINT;
  DECLARE below BIGINT;
  DECLARE total BIGINT;
  SET total = (SELECT CAST(SUM(cents) AS BIGINT) FROM q90_li);
  WHILE lo < hi DO
    SET mid = (lo + hi) DIV 2;
    SET below = (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT)
                 FROM q90_li WHERE qty <= mid);
    IF 2 * below >= total THEN
      SET hi = mid;
    ELSE
      SET lo = mid + 1;
    END IF;
  END WHILE;
  SET below = (SELECT CAST(SUM(cents) AS BIGINT) FROM q90_li WHERE qty <= lo);
  -- Widen before the multiply (the round2j DECIMAL(38,0) idiom):
  -- below_cents ~1.6e13 at the 10x sweep corpus, so below * 1e6 would
  -- overflow BIGINT exactly where the oracle's SUM silently widens to
  -- HUGEINT — the engines must widen identically.
  SELECT CAST(lo AS BIGINT) AS qty_threshold,
         CAST(below AS BIGINT) AS below_cents,
         CAST(total AS BIGINT) AS total_cents,
         CAST(CAST(below AS DECIMAL(38,0)) * 1000000 DIV total
              AS BIGINT) AS share_ppm;
END
""")


Q90_SQL = f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         {_CENTS.format(col="l_extendedprice")} AS cents
  FROM lineitem
),
per AS (SELECT qty, SUM(cents) AS c FROM li GROUP BY qty),
cum AS (
  SELECT qty, SUM(c) OVER (ORDER BY qty) AS cum,
         SUM(c) OVER () AS total
  FROM per
),
hit AS (
  SELECT qty, cum, total FROM cum WHERE 2 * cum >= total
  ORDER BY qty LIMIT 1
)
SELECT CAST(qty AS BIGINT) AS qty_threshold,
       CAST(cum AS BIGINT) AS below_cents,
       CAST(total AS BIGINT) AS total_cents,
       CAST(cum * 1000000 // total AS BIGINT) AS share_ppm
FROM hit
"""

ROUND5B.update({
    "q90_sql_scripting": (q90_sql_scripting, Q90_SQL),
})

# ---------------------------------------------------------------- q91

# Bounded gate slice: the PARTITION BY TABLE-argument semantics are fully
# exercised by any multi-customer slice; the full-table per-row Python run
# is priced separately in SCALE.md (it is not a plan you'd run at scale).
_Q91_CUSTS = 1000


def q91_python_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF over a partitioned TABLE argument (native in Spark
    4.x, Arrow-batched under pythonUDTF.arrow.enabled): per-customer
    inter-order gaps — each customer's order stream arrives at one UDTF
    instance in (date, orderkey) order, and the generator yields one
    row per consecutive pair with the gap in days.

    This is the surface's first partitioned-table-argument UDTF: the
    engine plans it as a hash repartition on o_custkey + in-partition
    sort, i.e. the SAME exchange a window function needs — which is the
    honest scale statement: a LAG window (the oracle) computes this
    without Python, so the UDTF is gated as MACHINERY (for per-group
    logic that doesn't fit window/aggregate semantics, e.g. d54-style
    tokenizer loops), not as the recommended plan for gaps. State is
    O(1) per group (previous date only); the eval resets on key change
    so correctness never depends on instance-per-group placement.

    The gate runs on a BOUNDED slice (o_custkey < 1000, ~1/15 of the
    customers, identical on both engines): the feature under test is
    the PARTITION BY TABLE-argument semantics, which a slice exercises
    completely, while the full-table run is a per-row Python generator
    over every order — priced in SCALE.md as a machinery measurement,
    not carried in the headline bench (at 100x it would be a pure
    Python scale-killer; the LAG plan is what you'd run).
    """
    from pyspark.sql.functions import udtf

    # Arrow-batched transfer for ALL Python UDTFs this session — strictly
    # better than pickled rows, and the frame is lazy so a scoped
    # set-then-restore would revert before execution (q87 lesson).
    session_conf(spark, "spark.sql.execution.pythonUDTF.arrow.enabled",
                 "true")
    t(spark, sf, "orders").createOrReplaceTempView("q91_orders")

    @udtf(returnType="o_custkey: bigint, seq: bigint, gap_days: bigint")
    class OrderGaps:
        def __init__(self) -> None:
            self.key = None
            self.prev = None
            self.seq = 0

        def eval(self, row):
            k = row["o_custkey"]
            if k != self.key:  # defensive: never trust instance reuse
                self.key, self.prev, self.seq = k, None, 0
            self.seq += 1
            d = row["od"]
            if self.prev is not None:
                yield k, self.seq, (d - self.prev).days
            self.prev = d

    spark.udtf.register("q91_gaps", OrderGaps)
    return spark.sql(f"""
SELECT o_custkey, seq, gap_days
FROM q91_gaps(TABLE(SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
                           o_orderkey
                    FROM q91_orders WHERE o_custkey < {_Q91_CUSTS})
              PARTITION BY o_custkey ORDER BY (od, o_orderkey))
""")


Q91_SQL = f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey
  FROM orders WHERE o_custkey < {_Q91_CUSTS}
),
s AS (
  SELECT o_custkey, od,
         ROW_NUMBER() OVER w AS seq,
         LAG(od) OVER w AS prev
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)
)
SELECT o_custkey, CAST(seq AS BIGINT) AS seq,
       CAST(datediff('day', prev, od) AS BIGINT) AS gap_days
FROM s WHERE prev IS NOT NULL
"""

ROUND5B.update({
    "q91_python_udtf": (q91_python_udtf, Q91_SQL),
})

# ---------------------------------------------------------------- d56


def d56_cross_source_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source near-duplicate leakage matrix: the memoized exact
    Jaccard >= 1/2 pair graph (d47's frame, third consumer after
    d47/d48) aggregated by unordered source pair, normalized by the
    number of possible cross-pairs — the table a curation team reads to
    decide which source overlaps which (mirror sites, scrape overlap,
    benchmark bleed) before setting d38-style quotas.

    Every unordered source pair is reported, zeros included, so the
    matrix is complete and its shape is data-independent. Scale shape:
    the pair graph is the expensive object and it is built ONCE per
    session (memoized, subquadratic by prefix filtering); this query
    adds two doc_id lookups against a 2-column (doc_id, source)
    projection and a groupBy over at most |sources|^2 keys. The
    source-count matrix is |sources|^2 rows (400 here) — broadcast
    territory at any corpus size, since sources are a catalog, not
    data.
    """
    from etl_docker_spark.plans.round4b import prefix_jaccard_pairs_frame

    pairs = prefix_jaccard_pairs_frame(spark, sf)
    docs = t(spark, sf, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = counts.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    b = counts.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    matrix = a.crossJoin(b).filter(F.col("src_a") <= F.col("src_b"))

    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    tagged = (pairs.join(sa, "doc_a").join(sb, "doc_b")
              .select(F.least("sa", "sb").alias("src_a"),
                      F.greatest("sa", "sb").alias("src_b")))
    hits = tagged.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("pair_count"))

    possible = F.when(
        F.col("src_a") == F.col("src_b"),
        (F.col("n_a") * (F.col("n_a") - 1)) / 2,
    ).otherwise(F.col("n_a") * F.col("n_b")).cast("long")
    out = (matrix.join(hits, ["src_a", "src_b"], "left")
           .withColumn("pair_count",
                       F.coalesce(F.col("pair_count"), F.lit(0)).cast("long"))
           .withColumn("possible_pairs", possible))
    leak = F.when(F.col("possible_pairs") > 0,
                  F.expr("pair_count * 1000000 DIV possible_pairs")
                  ).otherwise(F.lit(0)).cast("long")
    return out.select("src_a", "src_b", "pair_count", "possible_pairs",
                      leak.alias("leak_ppm"))


def _d56_sql() -> str:
    from etl_docker_spark.plans.round4b import D47_SQL

    return f"""
WITH pairs AS ({D47_SQL}),
ps AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b
  FROM pairs p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
),
cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
mat AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b
  FROM cnt a JOIN cnt b ON a.source <= b.source
),
agg AS (
  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS pair_count
  FROM ps GROUP BY src_a, src_b
)
SELECT m.src_a, m.src_b,
       CAST(COALESCE(g.pair_count, 0) AS BIGINT) AS pair_count,
       CAST(CASE WHEN m.src_a = m.src_b THEN m.n_a * (m.n_a - 1) // 2
                 ELSE m.n_a * m.n_b END AS BIGINT) AS possible_pairs,
       CAST(CASE WHEN (CASE WHEN m.src_a = m.src_b
                            THEN m.n_a * (m.n_a - 1) // 2
                            ELSE m.n_a * m.n_b END) > 0
                 THEN COALESCE(g.pair_count, 0) * 1000000
                      // (CASE WHEN m.src_a = m.src_b
                               THEN m.n_a * (m.n_a - 1) // 2
                               ELSE m.n_a * m.n_b END)
                 ELSE 0 END AS BIGINT) AS leak_ppm
FROM mat m LEFT JOIN agg g ON g.src_a = m.src_a AND g.src_b = m.src_b
"""


ROUND5B.update({
    "d56_cross_source_leakage": (d56_cross_source_leakage, _d56_sql()),
})

# ---------------------------------------------------------------- e22

_E22_PREFIX = 16     # matryoshka prefix dimensions used for the shortlist
_E22_SHORTLIST = 32  # prefix-scored candidates refined per query
_E22_K = 5           # exact-ranked results returned
_E22_NQ = 8          # queries = vec_id < 8, as in e01/e19


def e22_matryoshka_search(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka (prefix-dimension) two-stage retrieval: shortlist by
    cosine over the FIRST 16 of 64 dimensions, then exact full-dim
    rerank of the 32 survivors — the MRL serving pattern (Kusupati et
    al. NeurIPS'22) where one embedding column serves both a cheap
    coarse scan and an exact refine, no second index artifact.

    The e19 contrast is the point of having both: e19's coarse stage
    reads PQ CODES (a trained artifact, 4 table lookups); this one
    reads a PREFIX of the raw vector — 4x less arithmetic than full
    cosine with zero training, the right first stage when embeddings
    were matryoshka-trained. Same scale shape as e19: the corpus-wide
    stage carries (query_id, neighbor_id, score) into the top-32
    window — never the vectors — and the exact stage rejoins raw
    embeddings for only shortlist x n_queries rows, so refinement cost
    is corpus-size-independent. Output pins both ranks per survivor;
    prefix_rank near the shortlist edge is the evidence for widening
    (e20's sweep logic applies unchanged).
    """
    from etl_docker_spark.llm.similarity import (cosine_expr, dot_expr,
                                                 fan_out, norm2_expr)

    emb = t(spark, sf, "embeddings")
    pq = F.slice("embedding", 1, _E22_PREFIX)
    q = (emb.filter(F.col("vec_id") < _E22_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 pq.alias("qp"), norm2_expr(pq).alias("qpn2")))
    c = (fan_out(emb)
         .select(F.col("vec_id").alias("neighbor_id"),
                 pq.alias("cp"), norm2_expr(pq).alias("cpn2")))
    wq = Window.partitionBy("query_id")
    shortlist = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (dot_expr(F.col("qp"), F.col("cp"))
                 / F.sqrt(F.col("qpn2") * F.col("cpn2"))).alias("pcos"))
        .withColumn("prefix_rank", F.row_number().over(
            wq.orderBy(F.desc("pcos"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("prefix_rank") <= _E22_SHORTLIST)
        .select("query_id", "neighbor_id", "prefix_rank"))

    qv = (emb.filter(F.col("vec_id") < _E22_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nv"))
    exact = (shortlist.join(nv, "neighbor_id")
             .join(F.broadcast(qv), "query_id")
             .select("query_id", "neighbor_id", "prefix_rank",
                     cosine_expr(F.col("nv"), F.col("qv")).alias("cos_raw")))
    return (exact.withColumn("exact_rank", F.row_number().over(
        wq.orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("exact_rank") <= _E22_K)
        .select("query_id", "neighbor_id",
                F.round("cos_raw", 8).alias("cosine"),
                "exact_rank", "prefix_rank"))


_E22_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            "(x, y) -> x + y)")

E22_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         embedding[1:{_E22_PREFIX}] AS qp
  FROM embeddings WHERE vec_id < {_E22_NQ}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding AS nv, q.qv,
         {_E22_DOT.format(a='q.qp', b='e.embedding[1:' + str(_E22_PREFIX) + ']')}
           / sqrt({_E22_DOT.format(a='q.qp', b='q.qp')}
                  * {_E22_DOT.format(a='e.embedding[1:' + str(_E22_PREFIX) + ']',
                                     b='e.embedding[1:' + str(_E22_PREFIX) + ']')}) AS pcos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
short AS (
  SELECT query_id, neighbor_id, nv, qv,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY pcos DESC, neighbor_id ASC)
              AS BIGINT) AS prefix_rank
  FROM scored
  QUALIFY prefix_rank <= {_E22_SHORTLIST}
),
exact AS (
  SELECT query_id, neighbor_id, prefix_rank,
         {_E22_DOT.format(a='nv', b='qv')}
           / sqrt({_E22_DOT.format(a='nv', b='nv')}
                  * {_E22_DOT.format(a='qv', b='qv')}) AS cos_raw
  FROM short
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS exact_rank,
       prefix_rank
FROM exact
QUALIFY exact_rank <= {_E22_K}
"""

ROUND5B.update({
    "e22_matryoshka_search": (e22_matryoshka_search, E22_SQL),
})
