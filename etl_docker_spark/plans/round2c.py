"""Round-2 third batch: benchmark decontamination, incremental (cross-
corpus) dedup, BM25 retrieval, random-hyperplane LSH, and sliding windows
through the streaming engine.

These fill the remaining "training-data pipeline at 100 TB" surface:
- d19: is my training corpus contaminated with my eval set? (n-gram
  overlap, the standard decontamination check)
- d20: dedup an INCOMING batch against the corpus already ingested —
  the steady-state shape of dedup in a continuously-fed pipeline
  (a full-corpus re-dedup per batch is a non-starter at 100 TB).
- d21: classic lexical retrieval (BM25) as a distributed scoring query,
  in exact integer fixed-point so the gate pins values, not just ranks.
- e07: sign-bit (random-hyperplane) LSH — the OTHER standard cosine ANN
  family next to IVF grid bucketing (e02..e06); candidates are band
  collisions, never an all-pairs pass.
- s07: sliding event-time windows executed through Structured Streaming,
  oracle = the batch answer (exactly-once check, as s01..s04).

Determinism discipline as everywhere else (plans/_util.py): md5-derived
pseudo-randomness, integer/fixed-point arithmetic, DECIMAL-exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import stream_state_partitions, t

# ---------------------------------------------------------------- d19

_CONTAM_N = 4  # n-gram order: long enough to be selective, short enough to hit


def d19_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least one
    distinct 4-gram with the held-out eval set (doc_id % 20 == 0).

    The standard pre-training hygiene pass (eval n-gram overlap). Scale
    shape: the eval set is tiny next to the corpus (benchmarks are MBs vs
    100 TB), so its distinct shingles BROADCAST and the corpus is never
    shuffled to probe them; only matching (doc_id, gram) rows — rare by
    construction — reach the per-doc count aggregation. Shingling is the
    codegen shingle_rows path (not the interpreted array lambda); the
    distinct-per-doc gram sets and their sizes aggregate exchange-free
    under its id partitioning.
    """
    from etl_docker_spark.llm.dedup import shingle_rows

    docs = t(spark, sf, "documents")
    # NOT checkpointed (unlike d22): the two consumers filter DISJOINT doc
    # subsets (eval 5% / corpus 95%), and the doc_id predicates push below
    # the shingling window — the two lazy branches together still shingle
    # each document exactly once, cheaper than forcing one materialized pass
    sh = (shingle_rows(docs, "doc_id", "text", _CONTAM_N)
          .withColumnRenamed("doc", "doc_id")
          .distinct())
    is_eval = F.pmod("doc_id", F.lit(20)) == 0
    eval_grams = sh.filter(is_eval).select(F.col("s").alias("g")).distinct()
    w = Window.partitionBy("doc_id")
    corpus = (sh.filter(~is_eval)
              .select("doc_id",
                      F.count("*").over(w).cast("long").alias("total_ngrams"),
                      F.col("s").alias("g")))
    hits = (corpus.join(F.broadcast(eval_grams), "g")
            .groupBy("doc_id", "total_ngrams")
            .agg(F.count("*").alias("shared_ngrams")))
    return hits.select(
        "doc_id", "shared_ngrams", "total_ngrams",
        F.expr("(1000000 * shared_ngrams) div total_ngrams")
        .alias("contamination_ppm"))


D19_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {_CONTAM_N - 1}, 1)),
             i -> array_to_string(tk[i:i+{_CONTAM_N - 1}], ' '))) AS sh
  FROM toks
),
ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 20 = 0
),
cg AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS total_ngrams, unnest(sh) AS g
  FROM sh WHERE doc_id % 20 != 0
),
hits AS (
  SELECT doc_id, total_ngrams, COUNT(*) AS shared_ngrams
  FROM cg JOIN ev USING (g)
  GROUP BY doc_id, total_ngrams
)
SELECT doc_id, shared_ngrams, total_ngrams,
       (1000000 * shared_ngrams) // total_ngrams AS contamination_ppm
FROM hits
"""

# ---------------------------------------------------------------- d20


def d20_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-ingest dedup: classify each document of an incoming
    batch (odd doc_id) against the already-ingested corpus (even doc_id) —
    duplicate-of-existing, duplicate-within-batch, or new — counted per
    (lang, status).

    The steady-state dedup shape: a daily batch is checked against the
    accumulated digest index, NOT by re-deduping the whole corpus. The
    digest canonicalizes to the document head (md5 of the first 64 chars
    — the d05 fingerprint idiom) so trivially-mutated copies still
    collide; swap in the full-text md5 for byte-exact policy. Every
    shuffle is digest-width (16-byte md5, never document bytes): the
    batch/index join is a narrow equi-join on digest, and within-batch
    first-wins is a digest-partitioned window. At 100 TB the digest index
    is itself a table (bucketed by digest) so this join co-locates.
    """
    docs = t(spark, sf, "documents")
    d = docs.select(
        "doc_id", "lang",
        F.md5(F.substring("text", 1, 64).cast("binary")).alias("digest"))
    incoming = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    existing = (d.filter(F.pmod("doc_id", F.lit(2)) == 0)
                .select("digest").distinct())
    w = Window.partitionBy("digest").orderBy("doc_id")
    classified = (
        incoming.withColumn("rn", F.row_number().over(w))
        .join(existing.withColumn("seen", F.lit(1)), "digest", "left")
        .select(
            "lang",
            F.when(F.col("seen").isNotNull(), F.lit("dup_of_existing"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new")).alias("status")))
    return (classified.groupBy("lang", "status")
            .agg(F.count("*").alias("n_docs")))


D20_SQL = """
WITH d AS (
  SELECT doc_id, lang, md5(substring(text, 1, 64)) AS digest FROM documents
),
existing AS (
  SELECT DISTINCT digest FROM d WHERE doc_id % 2 = 0
),
class AS (
  SELECT i.lang,
         CASE WHEN e.digest IS NOT NULL THEN 'dup_of_existing'
              WHEN row_number() OVER (PARTITION BY i.digest
                                      ORDER BY i.doc_id) > 1
                THEN 'dup_in_batch'
              ELSE 'new' END AS status
  FROM d i LEFT JOIN existing e USING (digest)
  WHERE i.doc_id % 2 = 1
)
SELECT lang, status, COUNT(*) AS n_docs FROM class GROUP BY lang, status
"""

# ---------------------------------------------------------------- d21

_BM25_TERMS = ("spark", "vector", "customer", "stream")
_BM25_K = 10
# k1=1.2, b=0.75 cleared of floats: score = idf * 2.2*tf / (tf + 1.2*(0.25
# + 0.75*dl/avgdl)) with avgdl=S/N becomes idf_ppm * 22*tf*S // (10*tf*S +
# 3*S + 9*dl*N) — pure BIGINT ops, identical in any engine.


def d21_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 lexical retrieval: top-10 documents for a fixed term set, in
    exact parts-per-million integer arithmetic.

    idf_ppm = floor(1e6 * (N - df + .5)/(df + .5)) = (1e6*(2N-2df+1)) div
    (2df+1); the tf saturation term is cleared of avgdl division the same
    way (see module constants). Two-stage fixed point keeps every
    intermediate under 2^63 (tfpart <= k1+1 so tfpart_ppm <= 2.2e6; at
    true 100 TB the ppm products move to DECIMAL(38,0) unchanged).
    Scale shape: one corpus pass explodes tokens pre-filtered to the query
    terms (pushdown-friendly), doc-frequency and corpus totals are tiny
    aggregates broadcast back, and the final top-k is a distributed
    TakeOrdered (per-partition heaps), with rank assigned on the k-row
    result. The 10-row result memoizes per session — e08
    fuses it with the vector ranking without re-running the corpus pass.
    """
    from etl_docker_spark.llm.index_cache import memo_frame

    return memo_frame(spark, f"d21_bm25:{sf}",
                      lambda: _d21_build(spark, sf), sf_dir=sf)


def _d21_build(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("tk"))
    dl = toks.select("doc_id", F.size("tk").cast("long").alias("dl"))
    totals = dl.agg(F.count("*").alias("n_docs_total"),
                    F.sum("dl").alias("sum_dl"))
    tf = (toks.select("doc_id", F.explode("tk").alias("tok"))
          .filter(F.col("tok").isin(*_BM25_TERMS))
          .groupBy("doc_id", "tok")
          .agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("tok").agg(
        F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.expr("""
              ((1000000 * (2*n_docs_total - 2*df + 1)) div (2*df + 1))
              * ((1000000 * 22 * tf * sum_dl)
                 div (10*tf*sum_dl + 3*sum_dl + 9*dl*n_docs_total))
              div 1000000
            """).alias("term_score_ppm")))
    ranked = (scored.groupBy("doc_id")
              .agg(F.sum("term_score_ppm").alias("bm25_ppm")))
    # Distributed top-k: orderBy().limit() plans TakeOrderedAndProject
    # (per-partition heaps + k-row merge), never a corpus-wide single-task
    # sort. The explicit rank is then computed on the k-row result only,
    # via the windowless bounded-frame triangle (operators/rank.py) — the
    # earlier global row_number() over ALL scored docs was the
    # single-partition WindowExec shape that dies at 100 TB (see
    # operators/prefix.py); same output, hash-gate-identical.
    from etl_docker_spark.operators.rank import rank_bounded

    topk = ranked.orderBy(F.desc("bm25_ppm"), F.asc("doc_id")).limit(_BM25_K)
    return (rank_bounded(topk, [("bm25_ppm", True), ("doc_id", False)],
                         "rank")
            .select("doc_id", "bm25_ppm", "rank"))


_BM25_IN = ", ".join(f"'{t_}'" for t_ in _BM25_TERMS)
D21_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
  WHERE tok IN ({_BM25_IN})
  GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.doc_id,
         ((1000000 * (2*t.n - 2*f.df + 1)) // (2*f.df + 1))
         * ((1000000 * 22 * tf.tf * t.s)
            // (10*tf.tf*t.s + 3*t.s + 9*dl.dl*t.n))
         // 1000000 AS term_score_ppm
  FROM tf JOIN dfreq f USING (tok) JOIN dl USING (doc_id), totals t
),
ranked AS (
  SELECT doc_id, SUM(term_score_ppm) AS bm25_ppm,
         row_number() OVER (ORDER BY SUM(term_score_ppm) DESC, doc_id)
           AS rank
  FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(bm25_ppm AS BIGINT) AS bm25_ppm,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_BM25_K}
"""

# ---------------------------------------------------------------- e07


def e07_hyperplane_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-bit (random-hyperplane) LSH near-dup pairs, cosine >= 0.4.

    The second classic cosine-ANN family beside the IVF grid (e02): md5-
    derived int16 hyperplanes, floor-quantized components, 32-bit
    signatures banded 4x8 (8-bit band keys keep random-pair collisions
    ~0.4%/band — the 4-bit original admitted ~6% and went quadratic at
    10x corpus). Candidates = band collisions (recall < 1 by design, like
    every LSH); survivors verified by exact cosine so the gate pins values.

    The signature table is a deterministic trained artifact, memoized via
    index_cache (sign projections are ~60% of the wall time at ~sf1; a
    warm session or the disk tier serves them instead of re-projecting).
    """
    from etl_docker_spark.llm.index_cache import memo_frame
    from etl_docker_spark.llm.similarity import (hyperplane_lsh_pairs,
                                                 hyperplane_signatures)

    emb = t(spark, sf, "embeddings")
    sig = memo_frame(spark, f"e07_sig:{sf}",
                     lambda: hyperplane_signatures(emb), sf_dir=sf)
    return hyperplane_lsh_pairs(emb, threshold=0.4, signatures=sig)


E07_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
           "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
           "(x, y) -> x + y)")
E07_SQL = f"""
WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
comps AS (
  SELECT id, d,
         CAST(floor(CAST(v[d] AS DOUBLE) * 1024) AS BIGINT) + 1048576 AS qd
  FROM e, (SELECT unnest(generate_series(1, 64)) AS d)
),
stats AS (
  SELECT d, SUM(qd) // COUNT(*) AS mu,
         1048576 // greatest(greatest(MAX(qd) - SUM(qd) // COUNT(*),
                                      SUM(qd) // COUNT(*) - MIN(qd)), 1)
           AS m
  FROM comps GROUP BY d
),
cc AS (
  SELECT id, comps.d, (qd - mu) * m AS z
  FROM comps JOIN stats USING (d)
),
proj AS (
  SELECT id, p,
         SUM((CAST('0x' || substring(md5('hp_' || CAST(p AS VARCHAR) || '_'
                                         || CAST(d AS VARCHAR)), 1, 4)
                   AS INT) - 32768) * z) AS s
  FROM cc, (SELECT unnest(generate_series(0, 31)) AS p)
  GROUP BY id, p
),
sig AS (
  SELECT id,
         SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
           AS sig
  FROM proj GROUP BY id
),
bt AS (
  SELECT id, b AS band_idx, (sig >> (b * 8)) & 255 AS key
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bt a JOIN bt b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.id < b.id
),
ver AS (
  SELECT id_a, id_b,
         {E07_DOT.format(a='ea.v', b='eb.v')}
           / sqrt({E07_DOT.format(a='ea.v', b='ea.v')}
                  * {E07_DOT.format(a='eb.v', b='eb.v')}) AS cos_raw
  FROM cand JOIN e ea ON ea.id = id_a JOIN e eb ON eb.id = id_b
)
SELECT id_a, id_b, round(cos_raw, 8) AS cosine
FROM ver WHERE cos_raw >= 0.4
"""

# ---------------------------------------------------------------- s07


def s07_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding event-time windows (1 day long, sliding every 12 h) executed
    THROUGH Structured Streaming into a memory sink; the oracle is the
    batch answer with each event expanded into its two covering windows —
    equality is the exactly-once check (same contract as s01..s04).
    """
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)
    from etl_docker_spark.streaming import tumbling_aggregate

    stream = _events_stream(spark, sf)
    agg = tumbling_aggregate(
        stream, "1 day",
        {"n_events": F.count("*"),
         "total_value": F.sum(F.col("value").cast("decimal(12,4)"))
         .cast("double")},
        keys=["event_type"], watermark="1 minute", slide="12 hours")
    name = f"s07_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


_HALF_DAY_US = 12 * 3600 * 1_000_000
S07_SQL = f"""
WITH expanded AS (
  SELECT make_timestamp(((epoch_us(ts) // {_HALF_DAY_US}) - k)
                        * {_HALF_DAY_US}) AS window_start,
         event_type, value
  FROM events, (SELECT unnest(generate_series(0, 1)) AS k)
)
SELECT window_start,
       window_start + INTERVAL 1 DAY AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM expanded
GROUP BY window_start, event_type
"""


ROUND2C = {
    "d19_contamination": (d19_contamination, D19_SQL),
    "d20_incremental_dedup": (d20_incremental_dedup, D20_SQL),
    "d21_bm25_search": (d21_bm25_search, D21_SQL),
    "e07_hyperplane_lsh": (e07_hyperplane_lsh, E07_SQL),
    "s07_stream_sliding": (s07_stream_sliding, S07_SQL),
}
