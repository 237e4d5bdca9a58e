"""Round-6 queries, first batch: a native-feature gate the round-6 probe
found live (SQL TABLE functions + LATERAL correlation, q92), plus three
new first-class operators for the training-data families — hashed-feature
linear-classifier inference (d58), binary-quantization Hamming retrieval
(e23), and bounded-hop weighted shortest paths (g07).

Probe notes (round-6 session): `CREATE TEMPORARY FUNCTION ... RETURNS
TABLE` resolves and LATERAL-correlates natively in this Spark 4.1 build
(the body may not call the `range` TVF with a non-foldable argument —
`explode(sequence(...))` is the shape that works). The state-store WRITER
still does NOT ship (`format("statestore")` write resolves but the jar has
no WriteBuilder — `StateDataSource does not allow create table as select`),
so the s26 repair round-trip stays environment-gated; the state CHANGE FEED
reader does ship and is gated by s27 (round6b).

Determinism discipline as everywhere (plans/_util.py): integer cents,
md5 as the only cross-engine hash, sum/count instead of engine AVG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

ROUND6: dict = {}

# ---------------------------------------------------------------- q92

_Q92_MAX_INST = 6  # installment count = 1 + (orderkey % 6), capped by design


def q92_sql_table_function(spark: SparkSession, sf: str) -> DataFrame:
    """SQL TABLE function (CREATE ... RETURNS TABLE) + LATERAL
    correlation — the row-GENERATING half of the SQL-UDF surface whose
    scalar half q82 gates. The function expands one order into its
    installment schedule (equal cents per installment, remainder cents
    on the last one — the exact-split idiom that never loses a cent);
    the LATERAL join correlates it per order row, and the aggregate
    pins per-installment-index totals.

    Engine path: the SQL function body is INLINED by the analyzer (no
    per-row interpreter, unlike a Python UDF) — the plan is
    explode(sequence) + projections, fully whole-stage-codegen, and the
    lateral explode is a one-to-few generator, not a join shuffle. At
    100 TB the schedule expansion is embarrassingly parallel per
    partition, and the final aggregate is the only exchange.

    Reference parity: the installment/expiration splitting of invoices
    (CotyData_IPN.py's due-date schedules) is the same shape — the
    reference loops per row in pandas; here the expansion is a
    declared, optimizer-visible generator.
    """
    spark.sql(f"""
CREATE OR REPLACE TEMPORARY FUNCTION q92_installments(
    total_cents BIGINT, n INT)
RETURNS TABLE (inst INT, inst_cents BIGINT)
RETURN SELECT
    i AS inst,
    CASE WHEN i = n THEN total_cents - (n - 1) * (total_cents DIV n)
         ELSE total_cents DIV n END AS inst_cents
FROM (SELECT explode(sequence(1, n)) AS i)
""")
    t(spark, sf, "orders").createOrReplaceTempView("q92_orders")
    return spark.sql(f"""
SELECT CAST(s.inst AS BIGINT) AS inst,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(s.inst_cents) AS BIGINT) AS total_cents,
       CAST(MIN(s.inst_cents) AS BIGINT) AS min_cents,
       CAST(MAX(s.inst_cents) AS BIGINT) AS max_cents
FROM q92_orders o,
LATERAL q92_installments(
    CAST(CAST(o.o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT),
    CAST(1 + o.o_orderkey % {_Q92_MAX_INST} AS INT)) s
GROUP BY CAST(s.inst AS BIGINT)
ORDER BY inst
""")


Q92_SQL = f"""
WITH sched AS (
  SELECT s.i AS inst,
         CASE WHEN s.i = n.n THEN n.total_cents
                                  - (n.n - 1) * (n.total_cents // n.n)
              ELSE n.total_cents // n.n END AS inst_cents
  FROM (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(12,4)) * 100 AS BIGINT)
             AS total_cents,
           1 + o_orderkey % {_Q92_MAX_INST} AS n
    FROM orders
  ) n, LATERAL (SELECT unnest(generate_series(1, CAST(n.n AS INT))) AS i) s
)
SELECT CAST(inst AS BIGINT) AS inst,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(inst_cents) AS BIGINT) AS total_cents,
       CAST(MIN(inst_cents) AS BIGINT) AS min_cents,
       CAST(MAX(inst_cents) AS BIGINT) AS max_cents
FROM sched
GROUP BY 1
ORDER BY inst
"""

ROUND6.update({
    "q92_sql_table_function": (q92_sql_table_function, Q92_SQL),
})

# ---------------------------------------------------------------- d58

_D58_BUCKETS = 4096   # hashed feature space (fastText-style)
# Decision bias in ppm units. Must sit INSIDE the achievable score range
# or the keep branch degenerates: per-doc scores are MEAN feature weight
# (weights uniform-ish in [-1000, 1000] ppm), so raw scores concentrate
# near 0 — measured [-210, 302] ppm across the sf0.001/sf0.01 corpora.
# -50 keeps roughly the top third, so BOTH keep branches carry rows at
# every SF (the round-6 ADVICE: the old -2000 made keep constant-false).
_D58_BIAS_PPM = -50


def d58_linear_classifier_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-feature linear-classifier INFERENCE over documents — the
    fastText-style quality-classifier pass every production curation
    pipeline runs corpus-wide (CCNet/GPT-3-style quality filtering):
    unigram + bigram features hashed into a fixed bucket space, one
    weight per bucket, document score = mean feature weight + bias,
    verdict = sign.

    The weights here are a deterministic function of the bucket id
    (w_ppm(b) = (b % 2001) - 1000) so both engines share the model
    without a serialized artifact; swapping in trained weights is a
    broadcast map lookup with the identical plan. Integer ppm fixed
    point end-to-end — no float accumulation to diverge.

    Scale shape: the entire pass is PER-ROW array arithmetic
    (split -> transform(md5 % B -> w) -> aggregate-sum), no explode, no
    shuffle, no Python — inference cost is one scan, embarrassingly
    parallel at any corpus size. The only exchange is the final
    per-(lang, verdict) rollup over 4 grouping keys. A 100 TB corpus
    scores in scan time; that property is the point of hashed linear
    models (vs transformer scorers) as the first filtering tier.
    """
    docs = t(spark, sf, "documents")
    bucket = ("pmod(CAST(conv(substring(md5({f}), 1, 8), 16, 10) AS BIGINT), "
              f"{_D58_BUCKETS})")
    w_ppm = f"({bucket.format(f='f')} % 2001) - 1000"
    # Tokenize ONCE per row, then build the feature array ONCE per row
    # (guide §4.1/§2.3: a non-lambda subexpression inside a HOF lambda is
    # re-evaluated per element — the old element_at(split(text), i + 2)
    # re-split the whole document per bigram, O(n_tokens^2) per doc; and
    # size()/aggregate() each rebuilt the array). Projecting tk, then fe,
    # as dedicated columns pins one evaluation each — split/concat are
    # non-cheap, so CollapseProject will not inline them into consumers.
    feated = (docs
              .select("doc_id", "lang", F.split(F.col("text"), " ")
                      .alias("tk"))
              .select("doc_id", "lang",
                      F.expr(feats_sql("tk")).alias("fe")))
    scored = feated.select(
        "doc_id", "lang",
        F.size("fe").cast("long").alias("n_feats"),
        F.expr(f"aggregate(transform(fe, f -> {w_ppm}), "
               "CAST(0 AS BIGINT), (acc, w) -> acc + w)").alias("sum_ppm"))
    # integer division on BOTH engines (Spark DIV == DuckDB //, both
    # truncate toward zero) — never CAST a float quotient (DuckDB's
    # double->BIGINT cast ROUNDS while Spark's truncates)
    score = F.expr("sum_ppm DIV n_feats") + F.lit(_D58_BIAS_PPM)
    per_doc = scored.select(
        "doc_id", "lang", "n_feats", score.alias("score_ppm"),
        (score > 0).alias("keep"))
    return (per_doc.groupBy("lang", "keep")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_feats").cast("long").alias("sum_feats"),
                 F.sum("score_ppm").cast("long").alias("sum_score_ppm"))
            .orderBy("lang", "keep"))


def feats_sql(tk: str = "split(text, ' ')") -> str:
    """Spark SQL expression for the unigram+bigram feature array, built
    from the token-array expression `tk`. Callers on a hot path should
    pre-project the token array into a column and pass its name, so the
    document is tokenized once per row instead of once per bigram (the
    HOF-lambda re-evaluation pitfall; see d58's feated comment). The
    default reproduces the original inline form byte-for-byte."""
    return (f"concat({tk}, "
            f"transform(slice({tk}, 1, "
            f"size({tk}) - 1), "
            f"(x, i) -> concat(x, '_', element_at({tk}, i + 2))))")


D58_SQL = f"""
WITH f AS (
  SELECT doc_id, lang,
         list_concat(
           string_split(text, ' '),
           list_transform(
             generate_series(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || '_'
                  || string_split(text, ' ')[i + 1])) AS feats
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(len(feats) AS BIGINT) AS n_feats,
         CAST(list_reduce(
           list_transform(feats, x ->
             (CAST('0x' || substring(md5(x), 1, 8) AS BIGINT)
              % {_D58_BUCKETS}) % 2001 - 1000),
           (a, b) -> a + b) AS BIGINT) AS sum_ppm
  FROM f
),
p AS (
  SELECT doc_id, lang, n_feats,
         sum_ppm // n_feats + {_D58_BIAS_PPM} AS score_ppm
  FROM s
)
SELECT lang, score_ppm > 0 AS keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_feats) AS BIGINT) AS sum_feats,
       CAST(SUM(score_ppm) AS BIGINT) AS sum_score_ppm
FROM p
GROUP BY lang, keep
ORDER BY lang, keep
"""

ROUND6.update({
    "d58_linear_classifier_scores": (d58_linear_classifier_scores, D58_SQL),
})

# ---------------------------------------------------------------- e23

_E23_SHORTLIST = 32  # Hamming-scored candidates refined per query
_E23_K = 5           # exact-ranked results returned
_E23_NQ = 8          # queries = vec_id < 8, as in e01/e19/e22


def sig_half(lo: int) -> F.Column:
    """One 32-bit half of the 64-dim sign-bit signature: bits 0..31 of
    dims lo+1 .. lo+32 (sign bit: x > 0), packed into a BIGINT by a
    per-row fold. Shared by e23 and e24's funnel."""
    return F.expr(
        f"aggregate(transform(slice(embedding, {lo + 1}, 32), "
        "(x, i) -> IF(x > 0, shiftleft(CAST(1 AS BIGINT), i), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a | b)")


def e23_binary_hamming_search(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-quantization two-stage retrieval: 1-bit sign quantization
    (64 dims -> one 64-bit signature), Hamming-distance shortlist, exact
    full-precision rerank — the fourth compression point on the
    recall/size curve beside PQ (e10), IVFPQ (e11) and SQ8 (e13), and
    the cheapest of all: 8 bytes/vector (32x smaller than raw float32),
    zero training, and the coarse stage is ONE xor + popcount per
    candidate (two 32-bit words here so both engines stay inside signed
    BIGINT). This is the binary-embedding serving pattern used when the
    corpus is too large even for PQ codes to stay in memory.

    The signature is packed into two BIGINT halves by a per-row
    aggregate fold (no shuffle, no UDF); the corpus-wide stage carries
    only (query_id, neighbor_id, hamming) into the top-32 window, and
    raw vectors rejoin for shortlist x n_queries rows only — the same
    corpus-size-independent refinement shape as e19/e22. Output pins
    both ranks per survivor, so shortlist-edge evidence (e20's sweep
    logic) applies unchanged.
    """
    from etl_docker_spark.llm.similarity import cosine_expr, fan_out

    emb = t(spark, sf, "embeddings")
    sigs = emb.select("vec_id", sig_half(0).alias("lo"),
                      sig_half(32).alias("hi"))
    q = (sigs.filter(F.col("vec_id") < _E23_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("lo").alias("qlo"), F.col("hi").alias("qhi")))
    ham = (F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
           + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))).cast("long")
    wq = Window.partitionBy("query_id")
    shortlist = (
        fan_out(sigs).crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                ham.alias("hamming"))
        .withColumn("ham_rank", F.row_number().over(
            wq.orderBy(F.asc("hamming"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("ham_rank") <= _E23_SHORTLIST))

    qv = (emb.filter(F.col("vec_id") < _E23_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    nv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nv"))
    exact = (shortlist.join(nv, "neighbor_id")
             .join(F.broadcast(qv), "query_id")
             .select("query_id", "neighbor_id", "hamming", "ham_rank",
                     cosine_expr(F.col("nv"), F.col("qv")).alias("cos_raw")))
    return (exact.withColumn("exact_rank", F.row_number().over(
        wq.orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))).cast("long"))
        .filter(F.col("exact_rank") <= _E23_K)
        .select("query_id", "neighbor_id",
                F.round("cos_raw", 8).alias("cosine"),
                "exact_rank", "hamming", "ham_rank"))


_E23_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            "(x, y) -> x + y)")

_E23_HALF = ("list_reduce(list_transform(generate_series({lo} + 1, "
             "{lo} + 32), i -> CASE WHEN embedding[i] > 0 THEN "
             "(CAST(1 AS BIGINT) << (i - {lo} - 1)) ELSE "
             "CAST(0 AS BIGINT) END), (a, b) -> a | b)")

E23_SQL = f"""
WITH sig AS (
  SELECT vec_id, embedding,
         {_E23_HALF.format(lo=0)} AS lo,
         {_E23_HALF.format(lo=32)} AS hi
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, lo AS qlo, hi AS qhi
  FROM sig WHERE vec_id < {_E23_NQ}
),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id, s.embedding AS nv, q.qv,
         CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
              AS BIGINT) AS hamming
  FROM sig s CROSS JOIN q
  WHERE s.vec_id <> q.query_id
),
short AS (
  SELECT query_id, neighbor_id, nv, qv, hamming,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY hamming ASC, neighbor_id ASC)
              AS BIGINT) AS ham_rank
  FROM scored
  QUALIFY ham_rank <= {_E23_SHORTLIST}
),
exact AS (
  SELECT query_id, neighbor_id, hamming, ham_rank,
         {_E23_DOT.format(a='nv', b='qv')}
           / sqrt({_E23_DOT.format(a='nv', b='nv')}
                  * {_E23_DOT.format(a='qv', b='qv')}) AS cos_raw
  FROM short
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS exact_rank,
       hamming, ham_rank
FROM exact
QUALIFY exact_rank <= {_E23_K}
"""

ROUND6.update({
    "e23_binary_hamming_search": (e23_binary_hamming_search, E23_SQL),
})

# ---------------------------------------------------------------- g07

_G07_SEEDS = 10     # seed suppliers: s_suppkey < 10 (g03's seed set)
_G07_MAX_HOPS = 4   # bounded-hop horizon, matching g03's BFS


def _g07_weighted_edges(spark: SparkSession, sf: str) -> DataFrame:
    """g02's mutual top-K co-trade edge set, both directions, with a
    deterministic symmetric integer weight (md5 of the unordered pair)
    standing in for a learned edge cost — same values in both engines."""
    from etl_docker_spark.plans.round2j import cotrade_edges

    und = cotrade_edges(spark, sf)
    und = und.unionAll(und.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
    w = (F.conv(F.substring(F.md5(F.concat_ws(
        "_", F.least("a", "b"), F.greatest("a", "b"))), 1, 8), 16, 10)
        .cast("long") % 99 + 1)
    return und.select("a", "b", w.alias("w"))


def g07_bounded_sssp(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-hop weighted shortest paths (Bellman-Ford relaxation)
    from the g03 seed set over the weighted co-trade graph — the
    ITERATIVE-DataFrame counterpart of g03's declarative recursion: g03
    gates WITH RECURSIVE computing min-HOP distance; this gates the
    per-round relax loop computing min-COST, the shape you need when
    the recursion must re-AGGREGATE between rounds (recursive CTEs
    can't fold a MIN per frontier, so path enumeration there is bounded
    only by degree — the relax loop keeps exactly one row per (seed,
    node) between rounds instead).

    Per round: one |frontier| x |E| equi-join shuffle partitioned on
    the node key, then a min-aggregate sharing that partitioning; the
    frame is localCheckpoint'd so the plan stays flat across rounds
    (g01's discipline). Early exit when a round improves nothing —
    detected with a bounded left-anti count (a driver-side SCALAR per
    round, q90's control-flow class, never row data). Rounds are capped
    at the hop horizon so results equal the oracle's depth-guarded
    enumeration: min cost over paths of <= 4 edges, which also keeps
    the oracle's UNION ALL recursion inside the degree-capped K^hops
    bound at any corpus size. The relax loop is
    `operators/graph.py:bounded_sssp` (brute-force-pinned in
    tests/test_round6.py).
    """
    from etl_docker_spark.operators.graph import bounded_sssp

    edges = _g07_weighted_edges(spark, sf).localCheckpoint()
    dist = bounded_sssp(edges, F.col("a") < _G07_SEEDS, _G07_MAX_HOPS)
    return dist.filter(F.col("seed") != F.col("node")) \
        .select("seed", "node", F.col("cost").cast("long").alias("min_cost"))


def _g07_sql() -> str:
    from etl_docker_spark.plans.round2j import G02_SQL

    edge_ctes = G02_SQL.strip().removeprefix("WITH").rsplit(
        "tri AS (", 1)[0].strip().rstrip(",")
    return f"""
WITH RECURSIVE {edge_ctes},
und AS (
  SELECT a, b,
         CAST('0x' || substring(md5(CAST(least(a, b) AS VARCHAR) || '_'
                                    || CAST(greatest(a, b) AS VARCHAR)),
                                1, 8) AS BIGINT) % 99 + 1 AS w
  FROM (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges)
),
reach (seed, node, cost, depth) AS (
  SELECT a AS seed, b AS node, w AS cost, 1 AS depth
  FROM und WHERE a < {_G07_SEEDS}
  UNION ALL
  SELECT r.seed, e.b AS node, r.cost + e.w, r.depth + 1
  FROM reach r JOIN und e ON e.a = r.node
  WHERE r.depth < {_G07_MAX_HOPS}
)
SELECT seed, node, CAST(MIN(cost) AS BIGINT) AS min_cost
FROM reach WHERE node <> seed
GROUP BY seed, node
"""


ROUND6.update({
    "g07_bounded_sssp": (g07_bounded_sssp, _g07_sql()),
})
