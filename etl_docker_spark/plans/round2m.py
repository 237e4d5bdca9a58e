"""Round-2 thirteenth batch: DSIR-style importance weighting and the SQ8
recall measurement.

- d34: data-selection importance weights (DSIR shape, Xie et al. 2023,
  arXiv:2302.03169): score every document by how much its unigram
  distribution looks like a TARGET domain (here lang='en') relative to
  the whole corpus — the importance-resampling signal used to select
  pretraining data that matches a downstream distribution. All arithmetic
  is Laplace-smoothed integer ppm ratios, so the gate pins every score.
- e14: recall@5 of the SQ8 index (e13) against the exact integer-dot
  scan over the same quantized vectors — isolates what the 8-bit codes
  lose, with no float metric in sight (e03/e12's discipline for the
  remaining compression point).

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d34

_DSIR_TARGET_LANG = "en"


def d34_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document importance weight toward the English target domain.

    token weight_ppm = ((f_target + 1) * C_corpus * 1e6)
                       div ((f_corpus + 1) * C_target)
    (Laplace-smoothed frequency ratio in ppm — the hashed-ngram ratio
    DSIR uses, with exact integer division instead of float logs so any
    engine reproduces it). Document score = sum of its token occurrences'
    weights; avg_weight_ppm = score div n_tokens is the resampling
    signal.

    Scale shape: two fused scans of the raw corpus (frequency pass,
    scoring pass) — deliberately NOT a checkpoint of the exploded token
    table, which would persist a corpus-sized intermediate (d19's
    lazy-double-branch discipline; the raw scan is the cheap thing, the
    explosion is free inside codegen). The weight table is
    token-type-keyed (narrow) and map-side combined; scoring is a
    token-keyed equi join followed by a per-doc sum — broadcastable
    weight table at bench scale, a plain shuffle join at 100 TB. Corpus
    totals ride a 1-row broadcast.
    """
    docs = t(spark, sf, "documents").select("doc_id", "lang", "text")
    toks = docs.select("doc_id", "lang",
                       F.explode(F.split("text", " ")).alias("tok"))
    freq = (toks.groupBy("tok")
            .agg(F.count("*").alias("f_corpus"),
                 F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
                       .otherwise(0)).alias("f_target")))
    totals = freq.agg(F.sum("f_corpus").alias("c_corpus"),
                      F.sum("f_target").alias("c_target"))
    weights = (freq.crossJoin(F.broadcast(totals))
               .select("tok",
                       F.expr("((f_target + 1) * c_corpus * 1000000)"
                              " div ((f_corpus + 1) * c_target)")
                       .alias("w_ppm")))
    return (toks.join(F.broadcast(weights), "tok")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("w_ppm").alias("dsir_score"))
            .select("doc_id", "n_tokens", "dsir_score",
                    F.expr("dsir_score div n_tokens").alias("avg_weight_ppm")))


D34_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
freq AS (
  SELECT tok, COUNT(*) AS f_corpus,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
           AS f_target
  FROM toks GROUP BY tok
),
totals AS (
  SELECT SUM(f_corpus) AS c_corpus, SUM(f_target) AS c_target FROM freq
),
weights AS (
  SELECT tok,
         ((f_target + 1) * c_corpus * 1000000)
           // ((f_corpus + 1) * c_target) AS w_ppm
  FROM freq, totals
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(w_ppm) AS BIGINT) AS dsir_score,
       CAST(SUM(w_ppm) // COUNT(*) AS BIGINT) AS avg_weight_ppm
FROM toks JOIN weights USING (tok)
GROUP BY doc_id
"""

# ---------------------------------------------------------------- e14


def e14_sq8_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@5 of SQ8 (e13) vs the exact integer-dot scan over the SAME
    floor-quantized vectors — what the 8-bit codes alone cost, isolated
    from quantizer-vs-float noise. Both sides share e13's query set and
    tie-break (score desc, id asc); the comparison join is 5 rows per
    query. Closes the compression family's measurement set: e03 (grid
    IVF), e12 (IVFPQ), e14 (SQ8).
    """
    from etl_docker_spark.plans.round2j import (_SQ_K, _SQ_NQ, _SQ_Q,
                                                e13_sq8_search)

    emb = t(spark, sf, "embeddings")
    comps = (emb.select(F.col("vec_id").alias("id"),
                        F.posexplode("embedding").alias("pos", "val"))
             .select("id", (F.col("pos") + 1).alias("d"),
                     F.floor(F.col("val").cast("double") * _SQ_Q)
                     .cast("long").alias("qd")))
    q = (comps.filter(F.col("id") < _SQ_NQ)
         .select(F.col("id").alias("qid"), "d", F.col("qd").alias("q_qd")))
    exact_scored = (comps.join(F.broadcast(q), "d")
                    .filter(F.col("id") != F.col("qid"))
                    .groupBy("qid", "id")
                    .agg(F.sum(F.col("q_qd") * F.col("qd")).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    exact_top = (exact_scored
                 .withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= _SQ_K)
                 .select(F.col("qid").alias("query_id"),
                         F.col("id").alias("neighbor_id")))
    sq = e13_sq8_search(spark, sf).select("query_id", "neighbor_id")
    matched = (exact_top.join(sq, ["query_id", "neighbor_id"])
               .groupBy("query_id").agg(F.count("*").alias("n_matched")))
    qids = exact_top.select("query_id").distinct()
    return (qids.join(matched, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_matched", F.lit(0)).cast("long")
                    .alias("n_matched"))
            .withColumn("recall_ppm",
                        F.expr(f"n_matched * 1000000 div {_SQ_K}")))


def _e14_sql() -> str:
    from etl_docker_spark.plans.round2j import _SQ_K, _SQ_NQ, _SQ_Q, E13_SQL

    e13_body = E13_SQL.strip().removeprefix("WITH")
    e13_head = e13_body.rsplit("SELECT query_id, neighbor_id, score, rank",
                               1)[0].strip()
    return f"""
WITH {e13_head},
sq AS (
  SELECT query_id, neighbor_id FROM ranked WHERE rank <= {_SQ_K}
),
exact_scored AS (
  SELECT q.qid, c.id, SUM(q.q_qd * c.qd) AS score
  FROM comps c JOIN q USING (d)
  WHERE c.id <> q.qid
  GROUP BY q.qid, c.id
),
exact_top AS (
  SELECT qid AS query_id, id AS neighbor_id
  FROM exact_scored
  QUALIFY row_number() OVER (PARTITION BY qid
                             ORDER BY score DESC, id) <= {_SQ_K}
),
matched AS (
  SELECT x.query_id, COUNT(*) AS n_matched
  FROM exact_top x JOIN sq ON sq.query_id = x.query_id
                          AND sq.neighbor_id = x.neighbor_id
  GROUP BY x.query_id
)
SELECT t.query_id, CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched,
       CAST(COALESCE(m.n_matched, 0) AS BIGINT) * 1000000 // {_SQ_K}
           AS recall_ppm
FROM (SELECT DISTINCT query_id FROM exact_top) t
LEFT JOIN matched m ON m.query_id = t.query_id"""


ROUND2M = {
    "d34_dsir_weights": (d34_dsir_weights, D34_SQL),
    "e14_sq8_recall": (e14_sq8_recall, _e14_sql()),
}
