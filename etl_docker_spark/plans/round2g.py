"""Round-2 seventh batch: tokenizer-training, data-layout, and vector-
compression passes.

- d27: BPE first-merge statistics — the corpus pass a tokenizer trainer
  runs before the first merge: character-pair frequencies weighted by
  word-type frequency. Two narrow groupBys (word types, then pairs), both
  map-side combined; no per-row Python anywhere.
- q43: zone-map layout — the write-side companion to partition pruning at
  100 TB: range-bucket the fact table on its natural sort key and emit
  each zone's pruning metadata (min/max of the sort and join keys, row
  count). The gate pins the exact-ntile formulation; the production write
  path is repartitionByRange + sortWithinPartitions (same semantics,
  sampled boundaries — tools/plan_audit shows the exchange).
- e09: product-quantization codes — the vector-compression leg of the ANN
  story (e02 grid -> e05/e06 trained IVF -> e09 PQ): the 64-dim embedding
  splits into 4 x 16-dim subspaces, each k-means-coded independently
  (k=4, two Lloyd iterations, e05's exact-arithmetic discipline), giving
  a 4-byte code per vector. At 100 TB the codebook is 16 rows broadcast;
  the corpus is scanned, never shuffled.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d27

_BPE_TOP = 20


def d27_bpe_pair_freqs(spark: SparkSession, sf: str) -> DataFrame:
    """Top character-pair frequencies over word TYPES weighted by type
    frequency — exactly the statistic BPE training maximizes on its first
    merge (Sennrich et al.; every adjacent symbol pair of every word,
    weighted by how often the word occurs in the corpus).

    Scale shape: the corpus collapses to word types FIRST (groupBy(word),
    map-side combined — the vocabulary is orders of magnitude smaller than
    the token stream), then pairs explode off types only. Both shuffles
    move (short-string, count) rows. Ties rank lexicographically so the
    output is total-ordered.
    """
    toks = (t(spark, sf, "documents")
            .select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") >= 2))
    wf = toks.groupBy("w").agg(F.count("*").alias("f"))
    pairs = (wf.select(
        "f", F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        F.col("w"))
        .select(F.expr("substring(w, i, 1)").alias("p1"),
                F.expr("substring(w, i + 1, 1)").alias("p2"), "f"))
    agg = pairs.groupBy("p1", "p2").agg(F.sum("f").alias("pair_count"))
    # the pair frame is charset^2-bounded (never data-sized), so rank it
    # with the windowless triangle (operators/rank.py) instead of an
    # unpartitioned window
    from etl_docker_spark.operators.rank import rank_bounded

    return (rank_bounded(agg, [("pair_count", True), ("p1", False),
                               ("p2", False)], "rank")
            .filter(F.col("rank") <= _BPE_TOP)
            .select("rank", "p1", "p2", "pair_count"))


D27_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS f FROM toks WHERE length(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT substring(w, i, 1) AS p1, substring(w, i + 1, 1) AS p2, f
  FROM wf, LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i)
),
agg AS (
  SELECT p1, p2, CAST(SUM(f) AS BIGINT) AS pair_count
  FROM pairs GROUP BY p1, p2
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, p1, p2) AS BIGINT)
         AS rank,
       p1, p2, pair_count
FROM agg
QUALIFY rank <= {_BPE_TOP}
"""

# ---------------------------------------------------------------- q43

_ZONES = 32


def q43_zonemap_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map metadata for a range layout of lineitem on l_shipdate: 32
    equal-height zones, each reporting the pruning stats a scan planner
    reads (min/max sort key, min/max join key, row count).

    This is the WRITE-side of partition pruning at 100 TB: a fact laid out
    by repartitionByRange(l_shipdate) + sortWithinPartitions gives every
    file a tight shipdate zone, so a date-windowed query prunes ~31/32 of
    the scan.

    The naive formulation — ntile over one global window — sorts the whole
    fact in a single task (measured: 8.5 s of the query's 8.5 s at 6M
    rows). This plan computes the SAME ntile via distributed two-phase
    ranking: row_number within each shipdate (the window partitions by
    date, so it parallelizes), plus each date's cumulative start offset
    from a per-date count aggregate (~2.5k rows, prefix-summed via the
    two-phase operators/prefix.py form, broadcast back). The oracle
    stays the plain `ntile(32)` — the
    gate itself proves the two-phase form is ntile-exact, q41-style.
    """
    from etl_docker_spark.operators.prefix import prefix_sum_ordered

    li = t(spark, sf, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber")
    per_date = li.groupBy("l_shipdate").agg(F.count("*").alias("cnt"))
    starts = (prefix_sum_ordered(per_date, [F.asc("l_shipdate")],
                                 "cnt", "__cum")
              .select("l_shipdate",
                      (F.col("__cum") - F.col("cnt")).alias("start")))
    n1 = li.agg(F.count("*").alias("n"))
    wr = Window.partitionBy("l_shipdate").orderBy("l_orderkey",
                                                  "l_linenumber")
    ranked = (li.withColumn("lr", F.row_number().over(wr))
              .join(F.broadcast(starts), "l_shipdate")
              .crossJoin(F.broadcast(n1))
              .withColumn("r", (F.col("start") + F.col("lr")).cast("long")))
    # ntile semantics: q = n div Z, m = n mod Z; the first m tiles hold
    # q+1 rows, the rest q (assumes n >= Z, true for every corpus here)
    zone = F.expr(
        f"CASE WHEN r <= (n DIV {_ZONES} + 1) * (n % {_ZONES}) "
        f"THEN (r - 1) DIV (n DIV {_ZONES} + 1) + 1 "
        f"ELSE (n % {_ZONES}) "
        f"  + (r - (n % {_ZONES}) * (n DIV {_ZONES} + 1) - 1) "
        f"    DIV (n DIV {_ZONES}) + 1 END").cast("long")
    return (ranked.withColumn("zone", zone)
            .groupBy("zone")
            .agg(F.count("*").alias("n_rows"),
                 F.min("l_shipdate").alias("min_shipdate"),
                 F.max("l_shipdate").alias("max_shipdate"),
                 F.min("l_orderkey").alias("min_orderkey"),
                 F.max("l_orderkey").alias("max_orderkey"))
            .select("zone", "n_rows", "min_shipdate", "max_shipdate",
                    "min_orderkey", "max_orderkey"))


Q43_SQL = f"""
WITH z AS (
  SELECT l_shipdate, l_orderkey,
         CAST(ntile({_ZONES}) OVER (ORDER BY l_shipdate, l_orderkey,
                                    l_linenumber) AS BIGINT) AS zone
  FROM lineitem
)
SELECT zone, COUNT(*) AS n_rows,
       MIN(l_shipdate) AS min_shipdate, MAX(l_shipdate) AS max_shipdate,
       MIN(l_orderkey) AS min_orderkey, MAX(l_orderkey) AS max_orderkey
FROM z GROUP BY zone
"""

# ---------------------------------------------------------------- e09

_PQ_SUBS = 4          # subspaces (16 dims each over the 64-dim embedding)
_PQ_K = 4             # codebook size per subspace
_PQ_Q = 1 << 20       # same component quantization as e05
_PQ_DIMS = 16


def _pq_dbl_dist(qv, cv):
    """Left-fold double squared distance over a 16-dim subvector —
    zip_with/aggregate (HOF) on purpose: the unrolled-chain variant is
    measurably slower (see llm/similarity.py), and the fold order is what
    the oracle's list_reduce mirrors."""
    return F.aggregate(
        F.zip_with(qv, cv,
                   lambda x, y: (x.cast("double") - y)
                   * (x.cast("double") - y)),
        F.lit(0.0), lambda a, v: a + v)


def _pq_train(sub: DataFrame, w: Window) -> tuple[DataFrame, DataFrame]:
    """One subspace's k-means coding: e05's two-Lloyd-iteration scheme
    (integer first-assignment, exact-mean centroids, double re-assignment)
    over a 16-dim quantized subvector. Input: (vec_id, qv); returns
    (codes, centroids) — codes (vec_id, cluster), centroids (cluster, cv
    as array<double>)."""
    c0 = (sub.filter(F.col("vec_id") < _PQ_K)
          .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv")))

    def int_dist(qv, cv):
        acc = F.lit(0).cast("long")
        for i in range(1, _PQ_DIMS + 1):
            d = F.element_at(qv, i) - F.element_at(cv, i)
            acc = acc + d * d
        return acc

    a1 = (sub.crossJoin(F.broadcast(c0))
          .select("vec_id", "qv", "cid",
                  int_dist(F.col("qv"), F.col("cv")).alias("dist"))
          .withColumn("rn", F.row_number().over(
              w.orderBy(F.asc("dist"), F.asc("cid"))))
          .filter(F.col("rn") == 1)
          .select("vec_id", "qv", F.col("cid").alias("cluster")))
    comp = a1.select("cluster", F.posexplode("qv").alias("dim", "val"))
    cent = (comp.groupBy("cluster", "dim")
            .agg((F.sum("val").cast("double") / F.count("*")).alias("m")))
    cent_l = (cent.groupBy("cluster")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("dim", "m"))),
                  lambda s: s["m"]).alias("cv")))

    codes = (a1.select("vec_id", "qv")
             .crossJoin(F.broadcast(cent_l))
             .select("vec_id", "cluster",
                     _pq_dbl_dist(F.col("qv"), F.col("cv")).alias("dist"))
             .withColumn("rn", F.row_number().over(
                 w.orderBy(F.asc("dist"), F.asc("cluster"))))
             .filter(F.col("rn") == 1)
             .select("vec_id", F.col("cluster")))
    return codes, cent_l


def _pq_base(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, qv0..qv3): the four quantized 16-dim subvectors, one
    corpus scan, memoized per session (llm/index_cache) for reuse by every
    subspace pipeline and every PQ-backed query."""
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.plans._util import ensure_session_confs

    ensure_session_confs(spark)
    return memo_frame(spark, f"pq_base:{sf}", lambda: t(
        spark, sf, "embeddings").select(
        "vec_id",
        *[F.transform(
            F.slice("embedding", s * _PQ_DIMS + 1, _PQ_DIMS),
            lambda x: F.floor(x.cast("double") * _PQ_Q).cast("long"))
          .alias(f"qv{s}") for s in range(_PQ_SUBS)],
    ), sf_dir=sf)


def _pq_trained(spark: SparkSession, sf: str,
                s: int) -> tuple[DataFrame, DataFrame]:
    """Memoized (codes, centroids) for subspace `s`: the training pass
    (_pq_train's Lloyd iterations) runs once per session; the code frame
    is the second assignment rebuilt from the pinned centroids (the same
    expressions _pq_train uses, so values are identical). Queries that
    share the index (e09/e10/e11/e12) stop re-deriving it — the
    train-once/serve-many contract a real ANN index has."""
    from etl_docker_spark.llm.index_cache import memo_frame

    base = _pq_base(spark, sf)
    sub = base.select("vec_id", F.col(f"qv{s}").alias("qv"))
    w = Window.partitionBy("vec_id")
    cents = memo_frame(spark, f"pq_cents:{s}:{sf}",
                       lambda: _pq_train(sub, w)[1], sf_dir=sf)

    def build_codes() -> DataFrame:
        return (sub.crossJoin(F.broadcast(cents))
                .select("vec_id", "cluster",
                        _pq_dbl_dist(F.col("qv"), F.col("cv")).alias("dist"))
                .withColumn("rn", F.row_number().over(
                    w.orderBy(F.asc("dist"), F.asc("cluster"))))
                .filter(F.col("rn") == 1)
                .select("vec_id", F.col("cluster")))

    return memo_frame(spark, f"pq_codes:{s}:{sf}", build_codes,
                      sf_dir=sf), cents


def e09_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization codes: the 64-dim embedding as 4 independent
    16-dim k-means codes (k=4 each) — the compression scheme ANN indexes
    use to keep 100 TB of vectors in RAM (a 4-byte code per 256-byte
    vector here; real deployments use 8x256).

    Each subspace trains with e05's exact-arithmetic two-iteration Lloyd
    scheme, so every code is bit-pinned by the oracle. The quantized
    subvector frame is localCheckpoint'ed once and feeds all four subspace
    pipelines (one corpus scan); codebooks are k-row broadcasts — the
    corpus itself is never shuffled.
    """
    out = None
    for s in range(_PQ_SUBS):
        code, _ = _pq_trained(spark, sf, s)
        code = code.withColumnRenamed("cluster", f"code{s}")
        out = code if out is None else out.join(code, "vec_id")
    return out.select("vec_id",
                      *[F.col(f"code{s}") for s in range(_PQ_SUBS)])


def _pq_sub_sql(s: int) -> str:
    lo, hi = s * _PQ_DIMS + 1, (s + 1) * _PQ_DIMS
    return f"""
e{s} AS (
  SELECT vec_id,
         list_transform(embedding[{lo}:{hi}],
             x -> CAST(floor(CAST(x AS DOUBLE) * {_PQ_Q}) AS BIGINT)) AS qv
  FROM embeddings
),
c0_{s} AS (SELECT vec_id AS cid, qv AS cv FROM e{s} WHERE vec_id < {_PQ_K}),
d1_{s} AS (
  SELECT e.vec_id, e.qv, c.cid,
         list_reduce(list_transform(generate_series(1, {_PQ_DIMS}),
             i -> (e.qv[i] - c.cv[i]) * (e.qv[i] - c.cv[i])),
             (a, b) -> a + b) AS dist
  FROM e{s} e, c0_{s} c
),
a1_{s} AS (
  SELECT vec_id, qv, cid AS cluster FROM d1_{s}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
cent_{s} AS (
  SELECT cluster, dim, CAST(SUM(val) AS DOUBLE) / COUNT(*) AS m
  FROM (SELECT a.cluster, u.i AS dim, a.qv[u.i] AS val
        FROM a1_{s} a,
             (SELECT unnest(generate_series(1, {_PQ_DIMS})) AS i) u)
  GROUP BY cluster, dim
),
cl_{s} AS (
  SELECT cluster, list(m ORDER BY dim) AS cv FROM cent_{s} GROUP BY cluster
),
code_{s} AS (
  SELECT vec_id, cluster AS code{s} FROM (
    SELECT a.vec_id, c.cluster,
           list_reduce(list_transform(generate_series(1, {_PQ_DIMS}),
               i -> (CAST(a.qv[i] AS DOUBLE) - c.cv[i])
                  * (CAST(a.qv[i] AS DOUBLE) - c.cv[i])),
               (a2, b2) -> a2 + b2) AS dist
    FROM a1_{s} a, cl_{s} c)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)"""


E09_SQL = ("WITH " + ",".join(_pq_sub_sql(s) for s in range(_PQ_SUBS))
           + "\nSELECT vec_id, code0, code1, code2, code3\n"
             "FROM code_0 JOIN code_1 USING (vec_id) "
             "JOIN code_2 USING (vec_id) JOIN code_3 USING (vec_id)")

# ---------------------------------------------------------------- e10

_ADC_K = 5
_ADC_NQ = 8  # queries = vec_id < 8, as in e01/e06


def e10_pq_adc_search(spark: SparkSession, sf: str) -> DataFrame:
    """ADC (asymmetric distance computation) top-k search over the PQ
    index — the standard way PQ-compressed corpora are actually searched
    (Jegou et al.): each query computes a tiny distance table to every
    subspace centroid (4 subs x 4 centroids here), and every corpus vector
    is scored by LOOKUP of its 4 codes, never by touching the raw vector.

    Scale shape: the corpus-side work is one scan of the (vec_id,
    code0..3) frame plus 4 broadcast hash joins against
    (queries x centroids) tables of 32 rows each — the raw embeddings are
    only read to train codebooks and quantize queries. Per-subspace
    centroid frames are localCheckpoint'ed (k rows) so the dtab branch
    doesn't re-run the training pass. Exactness: centroid means and
    fold-order distances inherit e05's discipline, so the oracle pins
    every distance bit-for-bit; ties (vectors sharing all 4 codes have
    identical ADC distance by construction) break by neighbor id.
    """
    wq = Window.partitionBy("query_id")
    return (_adc_scored(spark, sf)
            .withColumn("rank", F.row_number().over(
                wq.orderBy(F.asc("adc"), F.asc("neighbor_id"))).cast("long"))
            .filter(F.col("rank") <= _ADC_K)
            .select("query_id", "neighbor_id",
                    F.col("adc").alias("adc_dist"), "rank"))


def _adc_scored(spark: SparkSession, sf: str) -> DataFrame:
    """(query_id, neighbor_id, adc) for every corpus vector: e10's scored
    frame before ranking — also the shortlist source for e19's exact
    re-rank stage."""
    base = _pq_base(spark, sf)
    out = None
    dts = []
    for s in range(_PQ_SUBS):
        sub = base.select("vec_id", F.col(f"qv{s}").alias("qv"))
        codes, cents = _pq_trained(spark, sf, s)
        q = (sub.filter(F.col("vec_id") < _ADC_NQ)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("qv").alias("qvq")))
        dts.append(
            q.crossJoin(F.broadcast(cents))
            .select("query_id", F.col("cluster").alias(f"code{s}"),
                    _pq_dbl_dist(F.col("qvq"), F.col("cv")).alias(f"d{s}")))
        codes = codes.withColumnRenamed("cluster", f"code{s}")
        out = codes if out is None else out.join(codes, "vec_id")
    scored = out
    for s, dt in enumerate(dts):
        on = [f"code{s}"] if s == 0 else ["query_id", f"code{s}"]
        scored = scored.join(F.broadcast(dt), on)
    return (scored.filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    (F.col("d0") + F.col("d1") + F.col("d2")
                     + F.col("d3")).alias("adc")))


def _adc_dt_sql(s: int) -> str:
    return f"""
dt_{s} AS (
  SELECT q.vec_id AS query_id, c.cluster AS code,
         list_reduce(list_transform(generate_series(1, {_PQ_DIMS}),
             i -> (CAST(q.qv[i] AS DOUBLE) - c.cv[i])
                * (CAST(q.qv[i] AS DOUBLE) - c.cv[i])),
             (a, b) -> a + b) AS d
  FROM e{s} q, cl_{s} c WHERE q.vec_id < {_ADC_NQ}
)"""


E10_SQL = (
    "WITH " + ",".join(_pq_sub_sql(s) for s in range(_PQ_SUBS))
    + "," + ",".join(_adc_dt_sql(s) for s in range(_PQ_SUBS))
    + f""",
codes AS (
  SELECT vec_id, code0, code1, code2, code3
  FROM code_0 JOIN code_1 USING (vec_id)
  JOIN code_2 USING (vec_id) JOIN code_3 USING (vec_id)
),
scored AS (
  SELECT d0.query_id, c.vec_id AS neighbor_id,
         d0.d + d1.d + d2.d + d3.d AS adc
  FROM codes c
  JOIN dt_0 d0 ON d0.code = c.code0
  JOIN dt_1 d1 ON d1.query_id = d0.query_id AND d1.code = c.code1
  JOIN dt_2 d2 ON d2.query_id = d0.query_id AND d2.code = c.code2
  JOIN dt_3 d3 ON d3.query_id = d0.query_id AND d3.code = c.code3
  WHERE c.vec_id <> d0.query_id
)
SELECT query_id, neighbor_id, adc AS adc_dist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY adc, neighbor_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {_ADC_K}""")


ROUND2G = {
    "d27_bpe_pair_freqs": (d27_bpe_pair_freqs, D27_SQL),
    "q43_zonemap_layout": (q43_zonemap_layout, Q43_SQL),
    "e09_pq_codes": (e09_pq_codes, E09_SQL),
    "e10_pq_adc_search": (e10_pq_adc_search, E10_SQL),
}
