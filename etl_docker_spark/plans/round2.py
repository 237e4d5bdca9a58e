"""Round-2 surface widening: PII scrubbing, correlated scalar subqueries,
stream-stream joins, and a TRAINED IVF coarse quantizer (k-means) — the
operator families a training-data pipeline needs that round 1 didn't
expose as gated queries.

Cross-engine determinism notes per query; shared recipes in plans/_util.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d13

# RE2-and-Java-compatible patterns (no lookaround, no backrefs): the same
# text runs through Spark's regexp_replace and DuckDB's (with 'g').
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def scrub_pii(col, token: str = "[PII]"):
    """Redact emails, then URLs, then phone shapes (order matters: an email
    inside a URL query string must not leave a dangling host)."""
    out = F.regexp_replace(col, PII_EMAIL, token)
    out = F.regexp_replace(out, PII_URL, token)
    return F.regexp_replace(out, PII_PHONE, token)


def d13_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing over the documents table.

    The synthetic corpus has no PII, so the query plants a deterministic
    email + phone + URL per document (derived from doc_id) and then
    scrubs — the gate verifies detection counts AND the cleaned text
    byte-for-byte. Pure Column expressions, codegen, one scan, no shuffle.
    """
    docs = t(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" see https://ex.example.com/u/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return dirty.select(
        "doc_id",
        (F.regexp_count("text", F.lit(PII_EMAIL))
         + F.regexp_count("text", F.lit(PII_URL))
         + F.regexp_count("text", F.lit(PII_PHONE))).cast("long")
        .alias("n_pii"),
        scrub_pii(F.col("text")).alias("clean_text"),
    )


D13_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or call 555-01'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
              || ' see https://ex.example.com/u/' || CAST(doc_id AS VARCHAR)
           AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
          + len(regexp_extract_all(text, '{PII_URL}'))
          + len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_pii,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{PII_EMAIL}', '[PII]', 'g'),
           '{PII_URL}', '[PII]', 'g'),
           '{PII_PHONE}', '[PII]', 'g') AS clean_text
FROM dirty
"""

# ---------------------------------------------------------------- q32


def q32_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): revenue from
    small-lot line items — quantity under 20% of that part's average.

    Exercises the SQL scalar-subquery surface; Catalyst decorrelates it
    into an aggregate + join (no per-row re-execution — the reference
    would loop). Determinism: per-part AVG sums integral doubles (exact at
    any order); the revenue total uses the decimal-exact recipe.
    """
    t(spark, sf, "lineitem").createOrReplaceTempView("q32_lineitem")
    t(spark, sf, "part").createOrReplaceTempView("q32_part")
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
                 AS small_lot_revenue,
               COUNT(*) AS n_lines
        FROM q32_part p JOIN q32_lineitem l ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM q32_lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """)


Q32_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR)
            AS DOUBLE) AS small_lot_revenue,
       COUNT(*) AS n_lines
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""

# ---------------------------------------------------------------- s05


def s05_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join THROUGH Structured Streaming: each view
    event joined to the same user's purchases within the following 6 h.

    Both sides are watermarked streams; the join state is range-bounded by
    the event-time condition, so state eviction is automatic at the
    watermark — the scalable formulation of "correlate two event streams".
    Oracle = the batch join; equality checks exactly-once emission.
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    ev = _events_stream(spark, sf)
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "1 minute"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("buy_ts"))
            .withWatermark("buy_ts", "1 minute"))
    joined = (views.join(
        buys,
        F.expr("""v_user = b_user
                  AND buy_ts >= view_ts
                  AND buy_ts <= view_ts + interval 6 hours"""))
        .select(F.col("v_user").alias("user_id"), "view_id", "purchase_id",
                (F.unix_micros("buy_ts") - F.unix_micros("view_ts"))
                .alias("delta_us")))
    name = f"s05_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    return spark.table(name)


S05_SQL = """
SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '6 hours'
"""

# ---------------------------------------------------------------- e05

_KM_K = 8
_KM_Q = 1 << 20  # component quantization: floor(v * 2^20) as BIGINT


def e05_ivf_train(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED IVF coarse quantizer: two Lloyd iterations of k-means over
    the embedding corpus, k=8, init = the k lowest vec_ids. Output:
    (vec_id, cluster) after the second assignment.

    This is the scale path's answer to the floor-grid bucketer (e02-e04):
    a data-adapted partition of the vector space. Cross-engine exactness:
    components quantize to BIGINT (exact for float32 in range), iteration-1
    distances are integer arithmetic, centroid means are exact-int /
    count in DOUBLE, and iteration-2 distances fold left-to-right in
    DOUBLE — bit-identical to the DuckDB oracle's list_reduce.

    Plan shape: centroids broadcast both iterations (k rows); the corpus is
    scanned, never shuffled — the per-dim centroid aggregation shuffles
    narrow (cluster, dim, sum) triples only. At 100 TB that is the textbook
    distributed k-means: map-side partial sums, k*dims-row reduce.
    """
    e = t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * _KM_Q).cast("long"))
        .alias("qv"),
    )
    return _ivf_train_on(e)


def _ivf_train_on(e: DataFrame) -> DataFrame:
    """The e05 trainer over an arbitrary (vec_id, qv) frame — shared with
    e21's base-segment training (same init rule: the k lowest vec_ids of
    THIS frame)."""
    c0 = (e.filter(F.col("vec_id") < _KM_K)
          .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv")))

    def int_dist(qv, cv):
        return F.aggregate(
            F.zip_with(qv, cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda a, v: a + v)

    from pyspark.sql import Window

    w = Window.partitionBy("vec_id")
    a1 = (e.crossJoin(F.broadcast(c0))
          .select("vec_id", "qv", F.col("cid"),
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

    def dbl_dist(qv, cv):
        return F.aggregate(
            F.zip_with(qv, cv,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda a, v: a + v)

    return (a1.select("vec_id", "qv")
            .crossJoin(F.broadcast(cent_l))
            .select("vec_id", F.col("cluster"),
                    dbl_dist(F.col("qv"), F.col("cv")).alias("dist"))
            .withColumn("rn", F.row_number().over(
                w.orderBy(F.asc("dist"), F.asc("cluster"))))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster"))


def e05_assignments(spark: SparkSession, sf: str) -> DataFrame:
    """Memoized (vec_id, cluster) from e05's trained coarse quantizer —
    the train-once/serve-many artifact every IVF-backed query (e06, e11,
    e12, d33) routes through. First caller in a session pays the two
    Lloyd iterations; the rest reuse the pinned frame (values are
    deterministic, so cached == retrained bit-for-bit)."""
    from etl_docker_spark.llm.index_cache import memo_frame

    return memo_frame(spark, f"e05_assign:{sf}",
                      lambda: e05_ivf_train(spark, sf), sf_dir=sf)


E05_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_KM_Q}) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cv FROM e WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT e.vec_id, e.qv, c0.cid,
         list_reduce(list_transform(generate_series(1, len(e.qv)),
             i -> (e.qv[i] - c0.cv[i]) * (e.qv[i] - c0.cv[i])),
             (a, b) -> a + b) AS dist
  FROM e, c0
),
a1 AS (
  SELECT vec_id, qv, cid AS cluster FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
),
comp AS (
  SELECT a1.cluster, u.i AS dim, a1.qv[u.i] AS val
  FROM a1, (SELECT unnest(generate_series(1, 64)) AS i) u
),
cent AS (
  SELECT cluster, dim, CAST(SUM(val) AS DOUBLE) / COUNT(*) AS m
  FROM comp GROUP BY cluster, dim
),
cent_l AS (
  SELECT cluster, list(m ORDER BY dim) AS cv FROM cent GROUP BY cluster
),
d2 AS (
  SELECT a1.vec_id, c.cluster,
         list_reduce(list_transform(generate_series(1, len(a1.qv)),
             i -> (CAST(a1.qv[i] AS DOUBLE) - c.cv[i])
                * (CAST(a1.qv[i] AS DOUBLE) - c.cv[i])),
             (a, b) -> a + b) AS dist
  FROM a1, cent_l c
)
SELECT vec_id, cluster FROM d2
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
"""

# ---------------------------------------------------------------- s06


def s06_cdc_merge(spark: SparkSession, sf: str) -> DataFrame:
    """CDC-merge THROUGH the streaming engine: the events table arrives as
    three micro-batches (split by event_id, NOT by time — deliberately
    out of order) and each batch is upserted into a parquet target via
    foreachBatch with the out-of-order-safe merge
    (operators.merge, compare_target=True). Final state: latest event per
    user by (ts, event_id).

    The oracle is the batch argmax — equality proves the merge is
    arrival-order independent AND exactly-once-per-epoch. This is the
    reference's staging->merge load loop (CotyData_IPN.py:207-242) as a
    continuous pipeline.
    """
    import shutil
    import tempfile

    from etl_docker_spark.streaming.cdc import merge_stream_into

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    work = tempfile.mkdtemp(prefix="s06_")
    src, target = f"{work}/src", f"{work}/target"
    try:
        # three deliberately time-interleaved batches
        ev.repartitionByRange(3, "event_id").write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = merge_stream_into(
            stream, target, keys=["user_id"],
            order_by=[F.desc("ts"), F.desc("event_id")],
            checkpoint=f"{work}/ckpt", compare_target=True)
        q.awaitTermination(300)
        q.stop()
        final = (spark.read.parquet(target)
                 .select("user_id", F.col("ts").alias("last_ts"),
                         F.col("event_type").alias("last_type"),
                         F.col("value").alias("last_value"))
                 .localCheckpoint())  # pin before the workdir is deleted
        return final
    finally:
        shutil.rmtree(work, ignore_errors=True)


S06_SQL = """
SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""

# ---------------------------------------------------------------- d15


def d15_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition/boilerplate quality signals per document (the
    Gopher-rule family): token count, distinct-token count, most-frequent-
    token fraction, distinct-bigram fraction. High top-token or low
    distinct-bigram fractions flag boilerplate/spam for corpus filtering.

    Fractions are fixed-point parts-per-million via integer division —
    bit-identical across engines (no float division). One corpus pass
    builds the token rows (localCheckpoint); token and bigram stats
    aggregate narrow (doc, term, count) rows with map-side combine. Docs
    with < 2 tokens have no bigram row and are absent (inner join, mirrors
    the oracle).
    """
    from pyspark.sql import Window

    docs = t(spark, sf, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tok_rows = docs.select(
        F.col("doc_id").alias("doc"),
        F.posexplode(F.split("text", " ")).alias("pos", "w1"),
    ).localCheckpoint()

    tstats = (tok_rows.groupBy("doc", "w1").agg(F.count("*").alias("c"))
              .groupBy("doc")
              .agg(F.sum("c").cast("long").alias("n_tokens"),
                   F.count("*").cast("long").alias("n_distinct_tokens"),
                   F.max("c").cast("long").alias("top")))
    w = Window.partitionBy("doc").orderBy("pos")
    bstats = (tok_rows
              .select("doc", "w1", F.lead("w1").over(w).alias("w2"))
              .filter(F.col("w2").isNotNull())
              .groupBy("doc", "w1", "w2").agg(F.count("*").alias("k"))
              .groupBy("doc")
              .agg(F.sum("k").cast("long").alias("n_bigrams"),
                   F.count("*").cast("long").alias("n_distinct_bigrams")))
    return (tstats.join(bstats, "doc")
            .select(F.col("doc").alias("doc_id"), "n_tokens",
                    "n_distinct_tokens",
                    F.expr("CAST((1000000 * top) DIV n_tokens AS BIGINT)")
                    .alias("top_token_pm"),
                    F.expr("CAST((1000000 * n_distinct_bigrams) "
                           "DIV n_bigrams AS BIGINT)")
                    .alias("distinct_bigram_pm")))


D15_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w),
tstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
         CAST(MAX(c) AS BIGINT) AS top
  FROM tc GROUP BY doc_id
),
lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS bg
  FROM lists WHERE len(l) >= 2
),
bc AS (SELECT doc_id, bg, COUNT(*) AS k FROM big GROUP BY doc_id, bg),
bstats AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams
  FROM bc GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens,
       CAST((1000000 * t.top) // t.n_tokens AS BIGINT) AS top_token_pm,
       CAST((1000000 * b.n_distinct_bigrams) // b.n_bigrams AS BIGINT)
         AS distinct_bigram_pm
FROM tstats t JOIN bstats b USING (doc_id)
"""

# ---------------------------------------------------------------- q33


def q33_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 history build THROUGH operators/scd2.py: each customer's
    order-priority becomes an effective-dated dimension — one version per
    (customer, order date), valid until the next change date, latest
    version flagged current.

    The update batch is made deterministic first (per (custkey, date) keep
    the max-orderkey row) because SCD2 semantics require one version per
    effective instant. One shuffle on the business key (the version
    window); this is the reference's *_HISTORICO pattern
    (CotyData_IPN.py:1738-1801) as a single declarative operator.
    """
    from pyspark.sql import Window

    from etl_docker_spark.operators.scd2 import scd2_apply

    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey"))
    updates = (o.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("o_custkey", "o_orderpriority",
                       F.col("o_orderdate").alias("effective_ts")))
    return scd2_apply(None, updates, keys=["o_custkey"],
                      attrs=["o_orderpriority"])


Q33_SQL = """
WITH u AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1
)
SELECT o_custkey, o_orderpriority, valid_from,
       lead(valid_from) OVER w AS valid_to,
       lead(valid_from) OVER w IS NULL AS is_current
FROM u
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
"""

# ---------------------------------------------------------------- e06

# sequential-fold dot product, identical shape to llm_queries._DOT — the
# left-to-right fold makes DuckDB bit-match Spark's F.aggregate
_DOT2 = ("list_reduce(list_transform(generate_series(1, len({a})), "
         "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
         "(acc, x) -> acc + x)")


def e06_trained_ivf_search(spark: SparkSession, sf: str) -> DataFrame:
    """ANN search over the TRAINED index: corpus and queries are assigned to
    e05's k-means cells, candidates share the query's cell, exact cosine
    ranks top-5 (queries = vec_id < 8, self-matches excluded).

    Completes the IVF story end-to-end: train (e05) -> index (id-equi join
    of assignments onto vectors) -> search (broadcast queries into their
    cells). Versus the floor-grid bucketer (e03), cells adapt to the data
    distribution, so occupancy is balanced by construction — the trained
    answer to the hot-cell problem e02's cap handles for static grids. The
    assignment frame is localCheckpointed once and reused by both the
    corpus and query sides (single training pass).
    """
    from etl_docker_spark.llm.similarity import norm2_expr
    from etl_docker_spark.plans._util import ensure_session_confs

    ensure_session_confs(spark)
    assign = e05_assignments(spark, sf)
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm2_expr(F.col("embedding")).alias("n2"))
    ea = e.join(assign, "vec_id")
    q = (ea.filter(F.col("vec_id") < _KM_K)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("n2").alias("qn2"), "cluster"))
    from etl_docker_spark.llm.similarity import dot_expr

    from pyspark.sql import Window

    scored = (ea.join(F.broadcast(q), "cluster")
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      (dot_expr(F.col("qv"), F.col("embedding"))
                       / F.sqrt(F.col("qn2") * F.col("n2"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 8).alias("cosine"), "rank"))


_E05_BODY = E05_SQL.strip().removeprefix("WITH")
E06_SQL = f"""
WITH {_E05_BODY.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
emb AS (
  SELECT vec_id, embedding, {_DOT2.format(a='embedding', b='embedding')} AS n2
  FROM embeddings
),
ea AS (SELECT emb.*, assign.cluster FROM emb JOIN assign USING (vec_id)),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, n2 AS qn2, cluster
  FROM ea WHERE vec_id < {_KM_K}
),
scored AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         {_DOT2.format(a='q.qv', b='ea.embedding')}
           / sqrt(q.qn2 * ea.n2) AS cos_raw
  FROM ea JOIN q ON ea.cluster = q.cluster AND ea.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
"""

# ---------------------------------------------------------------- d14


def d14_dedup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """END-TO-END corpus deduplication: drop every near-duplicate document
    except its cluster's canonical member (min doc_id) — the operation a
    training pipeline actually runs on 100 TB. Survivors = docs in no
    cluster, plus each cluster's canonical.

    Composition of existing verified pieces: MinHash-LSH pairs -> connected
    components (d08) -> broadcast anti-join of the loser set onto the
    corpus (the cluster table is tiny relative to the corpus — pairs only).
    """
    from etl_docker_spark.plans.advanced import d08_dup_clusters

    clusters = d08_dup_clusters(spark, sf)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")) \
        .select("doc_id")
    docs = t(spark, sf, "documents")
    return (docs.join(F.broadcast(losers), "doc_id", "left_anti")
            .select("doc_id", "lang",
                    F.length("text").cast("long").alias("n_chars")))


def _d14_sql() -> str:
    from etl_docker_spark.plans.advanced import D08_SQL

    body = D08_SQL.strip().removeprefix("WITH RECURSIVE")
    head, tail = body.rsplit("SELECT node AS doc_id,", 1)
    return f"""
WITH RECURSIVE {head.strip()},
clusters AS (SELECT node AS doc_id, {tail}),
losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
SELECT d.doc_id, d.lang, CAST(len(d.text) AS BIGINT) AS n_chars
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
WHERE l.doc_id IS NULL
"""


ROUND2 = {
    "d13_pii_scrub": (d13_pii_scrub, D13_SQL),
    "d15_repetition_signals": (d15_repetition_signals, D15_SQL),
    "q32_scalar_subquery": (q32_scalar_subquery, Q32_SQL),
    "q33_scd2_history": (q33_scd2_history, Q33_SQL),
    "s05_stream_stream_join": (s05_stream_stream_join, S05_SQL),
    "s06_cdc_merge": (s06_cdc_merge, S06_SQL),
    "e05_ivf_train": (e05_ivf_train, E05_SQL),
    "e06_trained_ivf_search": (e06_trained_ivf_search, E06_SQL),
    "d14_dedup_corpus": (d14_dedup_corpus, _d14_sql()),
}
