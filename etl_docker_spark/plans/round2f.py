"""Round-2 sixth batch: a TPC-H Q21-shaped multi-correlation query,
training-sequence packing, and the composed keep/drop curation verdict.

- q42: "sole late shipper on a multi-supplier order" — the hardest TPC-H
  correlation shape (EXISTS + NOT EXISTS against the same fact table),
  expressed Spark-first as ONE aggregation over lineitem instead of the
  textbook double self-join.
- d25: sequence packing — how training pipelines concatenate documents
  into fixed-size context windows (GPT-style concat-and-split at document
  granularity); pure prefix-sum arithmetic, no packing heuristics to
  diverge on.
- d26: the composed curation verdict (C4/CCNet pipeline shape): priority-
  ordered rules stacking the engine's own primitives (token/diversity
  stats, exact-dup detection) into one keep/drop decision per document.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- q42

_LATE_DAYS = 60  # shipped more than this many days after the order date


def q42_sole_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper (> 60 days after the order
    date) on orders involving at least two suppliers — TPC-H Q21's
    correlation shape (EXISTS other-supplier AND NOT EXISTS other-late-
    supplier) on this schema's columns.

    Spark-first: instead of Q21's textbook pair of correlated self-joins
    (two extra scans of the fact table), pre-aggregate to the distinct
    (order, supplier) grain with a per-supplier any-late flag, then one
    order-level rollup counts suppliers and late suppliers as plain
    count/sum; the qualifying orders (|supps| > 1, |late| = 1) credit
    their single late supplier. Two count_distinct over one groupBy was
    2.7 s here (sf0.1) because Catalyst's Expand doubles every fact row
    for the multi-distinct rewrite; the pair-grain pre-aggregation does
    the same dedup map-side-combined and runs 1.6 s — and at 100 TB the
    Expand is 2x the fact shuffle, the pre-aggregation is |distinct
    pairs|. Supplier-name join broadcasts the dim.
    """
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate"))
    flagged = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .select("l_orderkey", "l_suppkey",
                       (F.datediff("l_shipdate", "o_orderdate") > _LATE_DAYS)
                       .alias("late")))
    per_pair = (flagged.groupBy("l_orderkey", "l_suppkey")
                .agg(F.max("late").alias("any_late")))
    per_order = (per_pair.groupBy("l_orderkey")
                 .agg(F.count("*").alias("n_supps"),
                      F.sum(F.col("any_late").cast("long")).alias("n_late"),
                      F.min(F.when(F.col("any_late"), F.col("l_suppkey")))
                      .alias("late_supp")))
    blamed = (per_order
              .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
              .groupBy(F.col("late_supp").alias("s_suppkey"))
              .agg(F.count("*").alias("numwait")))
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (blamed.join(F.broadcast(supp), "s_suppkey")
            .select("s_suppkey", "s_name", "numwait"))


Q42_SQL = f"""
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         datediff('day', o.o_orderdate, l.l_shipdate) > {_LATE_DAYS} AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM flagged GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, b.numwait
FROM (
  SELECT late_supp AS suppkey, COUNT(*) AS numwait
  FROM per_order WHERE n_supps > 1 AND n_late = 1
  GROUP BY late_supp
) b JOIN supplier s ON s.s_suppkey = b.suppkey
"""

# ---------------------------------------------------------------- d25

_PACK_CAPACITY = 2048  # context-window token budget per packed sequence


def d25_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Training-sequence packing: documents concatenated in doc_id order
    and split into 2048-token context windows; each document lands in the
    bin where its first token falls (concat-and-split at document
    granularity). Per bin: docs, tokens, and fill ppm (can exceed 1e6 —
    a document straddling the boundary overflows its bin; the tokenizer-
    level split would cut mid-document, which is below this operator's
    granularity).

    Pure prefix-sum arithmetic: bin = exclusive-prefix-tokens div capacity
    — no greedy heuristic whose tie-breaks could diverge cross-engine.
    Scale: the ordered prefix sum runs as the two-phase distributed form
    (operators/prefix.py — range partition, local running sum, K-row
    offset merge), never a single-task global window; in a real pipeline
    shards pack independently and doc_id stands for the shard-local
    order, so the same plan serves both the global and per-shard forms.
    """
    from etl_docker_spark.operators.prefix import prefix_sum_ordered

    docs = t(spark, sf, "documents")
    toks = prefix_sum_ordered(
        docs.select("doc_id",
                    F.size(F.split(F.col("text"), " ")).cast("long")
                    .alias("tok")),
        [F.asc("doc_id")], "tok", "cum")
    binned = toks.select(
        "doc_id", "tok",
        F.expr(f"(cum - tok) div {_PACK_CAPACITY}").alias("bin"))
    return (binned.groupBy("bin")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("tok").alias("tokens"))
            .select("bin", "n_docs", "tokens",
                    F.expr(f"(1000000 * tokens) div {_PACK_CAPACITY}")
                    .alias("fill_ppm")))


D25_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
  FROM documents
),
pre AS (
  SELECT doc_id, tok,
         SUM(tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tok AS before_
  FROM toks
)
SELECT CAST(before_ // {_PACK_CAPACITY} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS tokens,
       CAST((1000000 * SUM(tok)) // {_PACK_CAPACITY} AS BIGINT) AS fill_ppm
FROM pre GROUP BY 1
"""

# ---------------------------------------------------------------- d26

_MIN_TOKENS = 30  # below this a document is 'too_short'


def d26_curation_verdict(spark: SparkSession, sf: str) -> DataFrame:
    """The composed corpus-curation decision (C4/CCNet pipeline shape):
    one verdict per document from priority-ordered rules stacking the
    engine's own primitives —

        1. too_short      n_tokens < 30        (token_count)
        2. low_diversity  2*n_unique < n_tokens (Gopher repetition cut)
        3. exact_dup      later copy of an identical text (d01 digest,
                          keep-first by doc_id)
        4. keep

    Scale shape: rules 1-2 are per-row codegen expressions on the corpus
    scan; rule 3 is the d01 idiom — a row_number over an md5-digest
    window, the only shuffle, and digest-width at that. The verdict CASE
    is priority-ordered so each document reports the FIRST failing rule
    (what curation pipelines log for ablation accounting).
    """
    from etl_docker_spark.llm.text import token_count, tokens_of

    docs = t(spark, sf, "documents")
    toks = tokens_of(F.col("text"))
    wdig = Window.partitionBy("digest").orderBy("doc_id")
    staged = (docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.md5(F.col("text").cast("binary")).alias("digest"))
        .withColumn("dup_rn", F.row_number().over(wdig)))
    verdict = (F.when(F.col("n_tokens") < _MIN_TOKENS, "too_short")
               .when(2 * F.col("n_unique") < F.col("n_tokens"),
                     "low_diversity")
               .when(F.col("dup_rn") > 1, "exact_dup")
               .otherwise("keep"))
    return staged.select("doc_id", "n_tokens", "n_unique",
                         verdict.alias("verdict"))


D26_SQL = rf"""
WITH staged AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
           AS n_tokens,
         CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]')))
              AS BIGINT) AS n_unique,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
           AS dup_rn
  FROM documents
)
SELECT doc_id, n_tokens, n_unique,
       CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short'
            WHEN 2 * n_unique < n_tokens THEN 'low_diversity'
            WHEN dup_rn > 1 THEN 'exact_dup'
            ELSE 'keep' END AS verdict
FROM staged
"""


ROUND2F = {
    "q42_sole_late_supplier": (q42_sole_late_supplier, Q42_SQL),
    "d25_sequence_packing": (d25_sequence_packing, D25_SQL),
    "d26_curation_verdict": (d26_curation_verdict, D26_SQL),
}
