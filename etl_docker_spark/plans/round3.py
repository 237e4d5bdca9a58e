"""Round-3 queries: approximate-accuracy family with in-query tolerance
gates, mergeable-sketch shard unification, and the row-level quarantine
path under the oracle gate (VERDICT r2 items 5, 6, 8).

Tolerance-gate pattern: an approximate operator can't hash-match an exact
oracle, but the BOUND on its error can. The Spark side computes both the
estimate and the exact answer and surfaces `<bound holds>` as a boolean
column; the oracle computes the exact answer and emits literal TRUE. The
value-hash then passes iff the estimator honored its published error bound
on this corpus — a stronger statement than rows-only, with no tolerance
logic hidden in the harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import dsum, t

# ---------------------------------------------------------------- q58

_Q58_RSD = 0.01      # requested HLL++ relative standard deviation
_Q58_TOL = 0.05      # gate: |est - exact| / exact <= 5σ equivalent


def q58_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) vs exact, gated on relative error.

    Both sides run over the pre-deduped (event_type, user_id) pairs:
    HLL is duplicate-insensitive, so its estimate is bit-identical on
    distinct input, while the exact count becomes a plain count — one
    map-side-combined dedup shuffle instead of the Expand-doubled
    multi-distinct rewrite (2.3 s -> 1.0 s at sf0.1). At 100 TB only the
    HLL side survives (constant register state per group); the exact twin
    is the gate's measuring stick.
    """
    ev = t(spark, sf, "events")
    du = ev.select("event_type", "user_id").distinct()
    agg = du.groupBy("event_type").agg(
        F.count("*").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=_Q58_RSD).alias("apx"))
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("apx") - F.col("exact_users"))
         <= F.lit(_Q58_TOL) * F.col("exact_users")).alias("within_tol"))


Q58_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------- q59

_Q59_QS = (0.5, 0.9, 0.99)
_Q59_ACCURACY = 10000   # GK sketch: rank error <= n / accuracy
_Q59_DELTA = 0.005      # gate: observed rank within q +/- 0.5%


def q59_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) vs exact rank bounds.

    The estimate must be a data value whose rank falls within
    (q ± delta)·n; the exact bound values come from a row_number sort.
    At scale only the sketch side survives (constant memory per group);
    the exact sort is the gate's yardstick.
    """
    ev = t(spark, sf, "events").select("event_type", "value")
    n = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    apx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", list(_Q59_QS), _Q59_ACCURACY)
        .alias("apx"))
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = (ev.withColumn("rn", F.row_number().over(w))
              .join(F.broadcast(n), "event_type"))
    bound_aggs = []
    for i, q in enumerate(_Q59_QS):
        lo_rank = F.greatest(
            F.floor(F.lit(q - _Q59_DELTA) * F.col("n")), F.lit(1))
        hi_rank = F.least(
            F.ceil(F.lit(q + _Q59_DELTA) * F.col("n")), F.col("n"))
        bound_aggs.append(F.max(F.when(F.col("rn") == lo_rank,
                                       F.col("value"))).alias(f"lo{i}"))
        bound_aggs.append(F.max(F.when(F.col("rn") == hi_rank,
                                       F.col("value"))).alias(f"hi{i}"))
    bounds = ranked.groupBy("event_type").agg(*bound_aggs)
    joined = n.join(apx, "event_type").join(bounds, "event_type")
    oks = [((F.col("apx")[i] >= F.col(f"lo{i}"))
            & (F.col("apx")[i] <= F.col(f"hi{i}")))
           .alias(f"p{int(q * 100)}_ok")
           for i, q in enumerate(_Q59_QS)]
    return joined.select("event_type", "n", *oks)


Q59_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------- d36

_D36_K = 64
_D36_SHARDS = 16
_D36_RANGE = float(1 << 32)


def d36_sketch_shard_merge(spark: SparkSession, sf: str) -> DataFrame:
    """KMV sketch union across shards == sketch of the union (per lang).

    The mergeability property that makes sketches the 100 TB answer:
    each shard (here pmod(h, 16) — in production, each partition/day/
    datacenter) keeps only its k smallest hashes; the k smallest of the
    union of those k-sets is EXACTLY the k smallest of the full corpus,
    so a tree of unions over shard sketches reproduces the global
    estimate bit-for-bit without ever re-touching raw data. The query
    computes both paths and surfaces their equality; the estimate itself
    is deterministic (shared md5 hash), so the oracle recomputes it.
    """
    du = (t(spark, sf, "documents")
          .select("lang",
                  F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
                  .cast("long").alias("h"))
          .distinct())
    sharded = du.withColumn("shard", F.pmod("h", F.lit(_D36_SHARDS)))
    w_shard = Window.partitionBy("lang", "shard").orderBy("h")
    survivors = (sharded.withColumn("rn", F.row_number().over(w_shard))
                 .filter(F.col("rn") <= _D36_K).drop("rn", "shard"))
    w_lang = Window.partitionBy("lang").orderBy("h")
    merged = (survivors.withColumn("rn", F.row_number().over(w_lang))
              .groupBy("lang")
              .agg(F.max(F.when(F.col("rn") == _D36_K, F.col("h")))
                   .alias("hk_merged")))
    global_ = (du.withColumn("rn", F.row_number().over(w_lang))
               .groupBy("lang")
               .agg(F.max(F.when(F.col("rn") == _D36_K, F.col("h")))
                    .alias("hk_global"),
                    F.count("*").cast("long").alias("exact_distinct")))
    est = (F.when(F.col("exact_distinct") < _D36_K,
                  F.col("exact_distinct").cast("double"))
           .otherwise(F.lit(float(_D36_K - 1) * _D36_RANGE)
                      / F.col("hk_global")))
    return (global_.join(merged, "lang", "left")
            .select("lang", "exact_distinct",
                    est.alias("est_distinct"),
                    ((F.col("exact_distinct") < _D36_K)
                     | (F.col("hk_merged") == F.col("hk_global")))
                    .alias("merge_matches_global")))


D36_SQL = f"""
WITH du AS (
  SELECT DISTINCT lang,
         CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM du
),
g AS (
  SELECT lang,
         MAX(CASE WHEN rn = {_D36_K} THEN h END) AS hk,
         CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM r GROUP BY lang
)
SELECT lang, exact_distinct,
       CASE WHEN exact_distinct < {_D36_K}
            THEN CAST(exact_distinct AS DOUBLE)
            ELSE {float(_D36_K - 1) * _D36_RANGE} / hk
       END AS est_distinct,
       TRUE AS merge_matches_global
FROM g
"""

# ---------------------------------------------------------------- q60


def q60_quarantine_routing(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level quarantine under the gate (K7/K8 as a running query).

    Malformed rows (business rule: error events, or payload k out of
    range) are routed to a quarantine parquet dir by
    sinks.writers.route_rows_to_quarantine; the clean side aggregates
    per type and carries the quarantine count READ BACK FROM DISK — so
    equality with the filter-twin oracle proves the router dropped
    nothing, duplicated nothing, and persisted every bad row.
    """
    import shutil
    import tempfile

    from etl_docker_spark.sinks.writers import route_rows_to_quarantine

    ev = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    valid = (F.col("event_type") != "error") & (k <= 90)
    work = tempfile.mkdtemp(prefix="q60_")
    try:
        clean = route_rows_to_quarantine(
            ev, valid, f"{work}/quarantine", log_path=f"{work}/audit",
            load_table="events")
        n_quarantined = spark.read.parquet(f"{work}/quarantine").count()
        out = (clean.groupBy("event_type")
               .agg(F.count("*").alias("n_clean"),
                    dsum("value").alias("total_value"))
               .withColumn("n_quarantined",
                           F.lit(n_quarantined).cast("long")))
        return out.localCheckpoint()  # pin before the workdir is deleted
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q60_SQL = """
WITH bad AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
  WHERE event_type = 'error'
     OR CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
)
SELECT event_type, COUNT(*) AS n_clean,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS total_value,
       (SELECT c FROM bad) AS n_quarantined
FROM events
WHERE NOT (event_type = 'error'
           OR CAST(json_extract_string(props, '$.k') AS BIGINT) > 90)
GROUP BY event_type
"""


ROUND3 = {
    "q58_approx_distinct": (q58_approx_distinct, Q58_SQL),
    "q59_approx_percentile": (q59_approx_percentile, Q59_SQL),
    "d36_sketch_shard_merge": (d36_sketch_shard_merge, D36_SQL),
    "q60_quarantine_routing": (q60_quarantine_routing, Q60_SQL),
}

# ---------------------------------------------------------------- d37

_D37_TRAIN_PCT, _D37_VAL_PCT = 80, 10  # remainder = test


def d37_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split by content-free hash bucketing.

    The split a 100 TB curation pipeline actually ships: bucket =
    md5(doc_id) % 100 -> 80/10/10. Hash-of-key (not rand()) makes the
    assignment reproducible across runs, engines, and re-partitions, and
    adding documents never reassigns existing ones — the properties that
    keep eval sets uncontaminated as the corpus grows. Disjointness and
    completeness hold by construction; the gate pins the per-(lang,
    split) counts and char mass against the oracle's identical bucketing.
    """
    docs = t(spark, sf, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
    bucket = F.pmod(h, F.lit(100))
    split = (F.when(bucket < _D37_TRAIN_PCT, "train")
             .when(bucket < _D37_TRAIN_PCT + _D37_VAL_PCT, "val")
             .otherwise("test"))
    return (docs.select("lang", "n_chars", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


D37_SQL = f"""
WITH b AS (
  SELECT lang, n_chars,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < {_D37_TRAIN_PCT} THEN 'train'
            WHEN bucket < {_D37_TRAIN_PCT + _D37_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1, 2
"""

# ---------------------------------------------------------------- d38

_D38_QUOTA = 50


def d38_source_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quota sampling: keep at most K docs per source, chosen
    by deterministic hash order (uniform without replacement, stable
    under re-runs and corpus growth at the kept end).

    The anti-domination step of corpus curation — one crawl domain must
    not swamp the mixture. Hash-order top-K per group is a bounded
    per-partition heap + one shuffle on source; no global sort. The
    over-quota mass is reported, not silently dropped.
    """
    docs = t(spark, sf, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = (docs.select("source", "n_chars", "doc_id", h.alias("h"))
              .withColumn("rn", F.row_number().over(w)))
    return (ranked.groupBy("source")
            .agg(F.sum(F.when(F.col("rn") <= _D38_QUOTA, 1).otherwise(0))
                 .cast("long").alias("n_kept"),
                 F.sum(F.when(F.col("rn") <= _D38_QUOTA,
                              F.col("n_chars")).otherwise(0))
                 .cast("long").alias("chars_kept"),
                 F.sum(F.when(F.col("rn") > _D38_QUOTA, 1).otherwise(0))
                 .cast("long").alias("n_dropped")))


D38_SQL = f"""
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8) AS BIGINT), doc_id
         ) AS rn
  FROM documents
)
SELECT source,
       CAST(COUNT(*) FILTER (rn <= {_D38_QUOTA}) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(n_chars) FILTER (rn <= {_D38_QUOTA}), 0)
            AS BIGINT) AS chars_kept,
       CAST(COUNT(*) FILTER (rn > {_D38_QUOTA}) AS BIGINT) AS n_dropped
FROM r GROUP BY source
"""

ROUND3.update({
    "d37_hash_split": (d37_hash_split, D37_SQL),
    "d38_source_quota": (d38_source_quota, D38_SQL),
})

# ---------------------------------------------------------------- e16

_E16_NQ = 16
_E16_TAU = 0.20  # synthetic embeddings are near-orthogonal; 0.2 => O(100s) pairs


def e16_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Radius (range) search: ALL neighbors with cosine >= tau per query,
    routed through e05's trained IVF cells.

    The other half of the ANN workload besides top-k: dedup thresholds,
    "find everything similar enough" retrieval, where the answer size is
    data-dependent rather than fixed at k. Cell routing bounds candidates
    exactly as in e06/e15 (recall<1 by design — the IVF trade); within a
    cell the threshold prunes output, not work, so the cost model is
    candidates-per-cell — the quantity the trained quantizer balances.
    Reuses the memoized cell assignments (index_cache): zero training
    cost after any e05-family query has run.
    """
    from etl_docker_spark.llm.similarity import dot_expr, norm2_expr
    from etl_docker_spark.plans.round2 import e05_assignments

    assign = e05_assignments(spark, sf)
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm2_expr(F.col("embedding")).alias("n2"))
    ea = e.join(assign, "vec_id")
    q = (ea.filter(F.col("vec_id") < _E16_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("n2").alias("qn2"), "cluster"))
    cand = (ea.join(F.broadcast(q), "cluster")
            .filter(F.col("vec_id") != F.col("query_id")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (dot_expr(F.col("qv"), F.col("embedding"))
         / F.sqrt(F.col("qn2") * F.col("n2"))).alias("cosine"))
    return (scored.filter(F.col("cosine") >= _E16_TAU)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 8).alias("cosine")))


def _e16_sql() -> str:
    from etl_docker_spark.plans.round2 import _DOT2, _E05_BODY

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
q AS (
  SELECT vec_id AS query_id, embedding AS qv, n2 AS qn2, cluster
  FROM ea WHERE vec_id < {_E16_NQ}
),
scored AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         {_DOT2.format(a='q.qv', b='ea.embedding')}
           / sqrt(q.qn2 * ea.n2) AS cos_raw
  FROM ea JOIN q ON ea.cluster = q.cluster AND ea.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine
FROM scored WHERE cos_raw >= {_E16_TAU}
"""


ROUND3.update({
    "e16_range_search": (e16_range_search, _e16_sql()),
})

# ---------------------------------------------------------------- d39

_D39_STEPS = 2


def d39_bpe_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language BPE training, first 2 merge steps — d30's loop with
    the winner chosen PER LANG each step (multilingual tokenizer reality:
    vocabularies diverge per language, and training them together in one
    pass is one corpus scan + per-lang broadcast merges, not one job per
    language).

    Scale shape mirrors d30: the corpus collapses to (lang, word type)
    first; each step aggregates pairs off types only and applies each
    lang's single winning merge via a broadcast join on lang.
    """
    docs = t(spark, sf, "documents")
    wf = (docs
          .select("lang", F.explode(F.split("text", " ")).alias("w"))
          .filter(F.length("w") >= 2)
          .groupBy("lang", "w").agg(F.count("*").alias("f"))
          .select("lang",
                  F.concat(F.lit(" "),
                           F.regexp_replace("w", "(.)", "$1 ")).alias("sp"),
                  "f")
          .localCheckpoint())
    steps: list[DataFrame] = []
    cur = wf
    for step in range(1, _D39_STEPS + 1):
        syms = F.split(F.trim(F.col("sp")), " ")
        prs = (cur.filter(F.size(syms) >= 2)
               .select("lang", "f", F.explode(F.transform(
                   F.sequence(F.lit(1), F.size(syms) - 1),
                   lambda i: F.struct(
                       F.element_at(syms, i).alias("p1"),
                       F.element_at(syms, i + 1).alias("p2"))))
                   .alias("pr"))
               .select("lang", F.col("pr.p1").alias("p1"),
                       F.col("pr.p2").alias("p2"), "f"))
        agg = prs.groupBy("lang", "p1", "p2").agg(
            F.sum("f").alias("pair_count"))
        top = (agg.withColumn("rn", F.row_number().over(
            Window.partitionBy("lang")
            .orderBy(F.desc("pair_count"), F.asc("p1"), F.asc("p2"))))
            .filter(F.col("rn") == 1)
            .select("lang", F.lit(step).cast("long").alias("step"),
                    "p1", "p2", "pair_count"))
        steps.append(top)
        cur = (cur.join(F.broadcast(top.select("lang", "p1", "p2")), "lang")
               .select("lang", F.replace(
                   F.col("sp"),
                   F.concat(F.lit(" "), F.col("p1"), F.lit(" "),
                            F.col("p2"), F.lit(" ")),
                   F.concat(F.lit(" "), F.col("p1"), F.col("p2"),
                            F.lit(" "))).alias("sp"), "f"))
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _d39_sql() -> str:
    parts = ["""
WITH wf0 AS (
  SELECT lang, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp, f
  FROM (SELECT lang, w, COUNT(*) AS f
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE length(w) >= 2 GROUP BY lang, w)
)"""]
    for i in range(1, _D39_STEPS + 1):
        parts.append(f""",
pc{i} AS (
  SELECT lang, t.sy[i] AS p1, t.sy[i + 1] AS p2,
         CAST(SUM(f) AS BIGINT) AS pair_count
  FROM (SELECT lang, string_split(trim(sp), ' ') AS sy, f FROM wf{i - 1}) t,
       LATERAL (SELECT unnest(generate_series(1, len(t.sy) - 1)) AS i)
  WHERE len(t.sy) >= 2
  GROUP BY 1, 2, 3
),
t{i} AS (
  SELECT lang, CAST({i} AS BIGINT) AS step, p1, p2, pair_count FROM pc{i}
  QUALIFY row_number() OVER (PARTITION BY lang
                             ORDER BY pair_count DESC, p1, p2) = 1
),
wf{i} AS (
  SELECT w.lang,
         replace(w.sp, ' ' || t.p1 || ' ' || t.p2 || ' ',
                 ' ' || t.p1 || t.p2 || ' ') AS sp, w.f
  FROM wf{i - 1} w JOIN t{i} t USING (lang)
)""")
    union = " UNION ALL ".join(
        f"SELECT lang, step, p1, p2, pair_count FROM t{i}"
        for i in range(1, _D39_STEPS + 1))
    parts.append(f"\n{union}")
    return "".join(parts)


ROUND3.update({
    "d39_bpe_per_lang": (d39_bpe_per_lang, _d39_sql()),
})

# ---------------------------------------------------------------- d40


def d40_video_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Re-encoded-copy video dedup via decode-invariant frame signatures —
    the multimodal dedup a byte hash CANNOT do, through the real
    distributed decode path (ONE fused Arrow mapInPandas stage:
    demux -> decode -> frame fingerprints -> per-video signature; the
    per-video work is local by definition, so fusion removes two
    shuffles and three Arrow boundaries vs chaining the composable
    single-step operators — 4.5 s -> measured below at ~sf1).

    Every document yields two byte-DISTINCT "videos": the original and a
    re-containered copy (same stream, different trailer padding —
    strip_container's fake demux models the mp4-vs-mkv case). Dedup keys
    on the demuxed stream: decode once per video (extract_features ->
    stream checksum), sample frame offsets (duration is stream-derived),
    fingerprint each frame from the decoded state, and collapse each
    video to the md5 of its ordered fingerprint sequence. Exactly the
    original+copy pairs must collide: the gate pins one group per
    document, n_videos = 2, canonical = the original id.

    Scale: content bytes are read exactly once inside the fused stage
    and never shuffle; the only exchange is the tiny signature rollup.
    """
    from etl_docker_spark.llm.multimodal import video_signatures

    docs = t(spark, sf, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    original = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"))
    reenc = docs.select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("media_id"),
        F.concat(F.encode("text", "UTF-8"),
                 F.encode(F.lit("#PAD7"), "UTF-8")).alias("content"))
    media = original.unionByName(reenc)
    sigs = video_signatures(media)
    return (sigs.groupBy("signature")
            .agg(F.count("*").cast("long").alias("n_videos"),
                 F.min("media_id").alias("canonical_id"))
            .filter(F.col("n_videos") > 1))


D40_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS cs
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS media_id,
         CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS cs
  FROM documents
),
fr AS (
  SELECT media_id, cs,
         unnest(generate_series(0, cs % 5000, 1000)) AS frame_ms
  FROM m
),
fp AS (
  SELECT media_id, frame_ms,
         md5(CAST(cs AS VARCHAR) || ':' || CAST(frame_ms AS VARCHAR)) AS fp
  FROM fr
),
sig AS (
  SELECT media_id, md5(string_agg(fp, '' ORDER BY frame_ms)) AS signature
  FROM fp GROUP BY media_id
)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_videos,
       MIN(media_id) AS canonical_id
FROM sig GROUP BY signature HAVING COUNT(*) > 1
"""

ROUND3.update({
    "d40_video_near_dup": (d40_video_near_dup, D40_SQL),
})

# ---------------------------------------------------------------- e17

_E17_CAP = 60  # between the gate corpus's coldest (52) and hottest (74)
               # cluster occupancy: BOTH branches engage under the gate


def e17_cell_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    """IVF index maintenance: split hot cells so no serving cell exceeds
    the occupancy cap — the rebalance pass a trained quantizer needs as
    the corpus drifts (cells fill unevenly; serving cost per query is the
    occupancy of the probed cell).

    Hot clusters (> cap) sub-bucket on the floor grid of dim 1; cold
    clusters keep their identity (sub = NULL), so the index rewrite
    touches only hot-cell rows. One narrow occupancy rollup decides
    hotness; the assignment update is a broadcast of the hot-id set.
    Unlike the d33 cap (which must NOT engage on gate corpora), the
    split here IS the query — the cap sits below the gate corpus's
    hottest cluster so the gate exercises both branches. Output: final
    serving cells with occupancy, split provenance, and the per-cell
    bound check.
    """
    from etl_docker_spark.llm.similarity import bucket_expr
    from etl_docker_spark.plans.round2 import e05_assignments

    assign = e05_assignments(spark, sf)
    occ = assign.groupBy("cluster").agg(F.count("*").alias("occ"))
    hot = occ.filter(F.col("occ") > _E17_CAP).select("cluster")
    emb = t(spark, sf, "embeddings").select("vec_id", "embedding")
    ea = (assign.join(emb, "vec_id")
          .join(F.broadcast(hot.withColumn("is_hot", F.lit(True))),
                "cluster", "left"))
    cells = ea.select(
        "cluster",
        F.when(F.col("is_hot"),
               bucket_expr(F.col("embedding"), 1)).alias("sub_bucket"))
    return (cells.groupBy("cluster", "sub_bucket")
            .agg(F.count("*").cast("long").alias("n_vectors"))
            .select("cluster", "sub_bucket", "n_vectors",
                    F.col("sub_bucket").isNotNull().alias("was_split")))


def _e17_sql() -> str:
    from etl_docker_spark.plans.round2 import _E05_BODY

    return f"""
WITH {_E05_BODY.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()},
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
),
occ AS (SELECT cluster, COUNT(*) AS occ FROM assign GROUP BY cluster),
cells AS (
  SELECT a.cluster,
         CASE WHEN o.occ > {_E17_CAP}
              THEN CAST(floor(CAST(e.embedding[1] AS DOUBLE) * 4) AS BIGINT)
         END AS sub_bucket
  FROM assign a
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN occ o ON o.cluster = a.cluster
)
SELECT cluster, sub_bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       sub_bucket IS NOT NULL AS was_split
FROM cells GROUP BY cluster, sub_bucket
"""


ROUND3.update({
    "e17_cell_rebalance": (e17_cell_rebalance, _e17_sql()),
})

# ---------------------------------------------------------------- d41


def d41_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus snapshot diff: crawl N vs N-1 classified per document as
    added / removed / changed / unchanged, rolled up per lang — the
    primitive that makes every downstream pass incremental (re-embed,
    re-dedup, re-score only the changed slice instead of 100 TB).

    Snapshots derive deterministically from one table: v1 drops
    doc_id%10==0, v2 drops %10==1 and revises the text of %10==2. The
    diff is a digest-based full outer join on doc_id — digests (16
    bytes), never text, are what shuffles; at scale both sides are
    digest manifests, the cheapest possible representation of "what
    changed".
    """
    docs = t(spark, sf, "documents").select(
        "doc_id", "lang", F.md5("text").alias("digest"))
    v1 = docs.filter(F.pmod("doc_id", F.lit(10)) != 0)
    v2 = (docs.filter(F.pmod("doc_id", F.lit(10)) != 1)
          .withColumn("digest",
                      F.when(F.pmod("doc_id", F.lit(10)) == 2,
                             F.md5(F.concat(F.col("digest"),
                                            F.lit(":rev2"))))
                      .otherwise(F.col("digest"))))
    j = (v1.select("doc_id", "lang", F.col("digest").alias("d1"))
         .join(v2.select("doc_id", "lang", F.col("digest").alias("d2")),
               ["doc_id", "lang"], "full_outer"))
    status = (F.when(F.col("d1").isNull(), "added")
              .when(F.col("d2").isNull(), "removed")
              .when(F.col("d1") != F.col("d2"), "changed")
              .otherwise("unchanged"))
    return (j.select("lang", status.alias("status"))
            .groupBy("lang", "status")
            .agg(F.count("*").alias("n_docs")))


D41_SQL = """
WITH d AS (
  SELECT doc_id, lang, md5(text) AS digest FROM documents
),
v1 AS (SELECT * FROM d WHERE doc_id % 10 <> 0),
v2 AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 2 THEN md5(digest || ':rev2')
              ELSE digest END AS digest
  FROM d WHERE doc_id % 10 <> 1
),
j AS (
  SELECT COALESCE(v1.lang, v2.lang) AS lang, v1.digest AS d1,
         v2.digest AS d2
  FROM v1 FULL OUTER JOIN v2 USING (doc_id)
)
SELECT lang,
       CASE WHEN d1 IS NULL THEN 'added'
            WHEN d2 IS NULL THEN 'removed'
            WHEN d1 <> d2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_docs
FROM j GROUP BY 1, 2
"""

ROUND3.update({
    "d41_snapshot_diff": (d41_snapshot_diff, D41_SQL),
})

# ---------------------------------------------------------------- q61


def q61_jsonl_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """File-based JSONL ingestion with bad-record quarantine under the
    gate (sources/files.py): events serialize to JSON lines — rows with
    event_id % 37 == 0 deliberately truncated mid-object — land in a drop
    dir, and ONE permissive scan splits parsed rows from corrupt lines.
    Clean rows aggregate per type; the corrupt count rides every row.
    Equality with the filter-twin oracle proves the scan parsed every
    good line, rejected every bad one, and lost nothing.

    Amounts travel as integer micros (pre-serialization round), so no
    double makes a text round-trip.
    """
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from etl_docker_spark.sources.files import read_jsonl_with_quarantine

    ev = t(spark, sf, "events").select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("micros"))
    payload = F.to_json(F.struct("event_id", "user_id", "event_type",
                                 "micros"))
    line = F.when(F.pmod("event_id", F.lit(37)) == 0,
                  F.concat(F.lit('{"event_id":'),
                           F.col("event_id").cast("string"))
                  ).otherwise(payload)
    work = tempfile.mkdtemp(prefix="q61_")
    try:
        ev.select(line.alias("value")).write.mode("overwrite").text(work)
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("micros", T.LongType()),
        ])
        clean, corrupt = read_jsonl_with_quarantine(spark, work, schema)
        n_corrupt = corrupt.count()
        out = (clean.groupBy("event_type")
               .agg(F.count("*").alias("n_events"),
                    F.sum("micros").alias("sum_micros"),
                    F.countDistinct("user_id").cast("long")
                    .alias("n_users"))
               .withColumn("n_corrupt", F.lit(n_corrupt).cast("long")))
        return out.localCheckpoint()  # pin before the drop dir is deleted
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q61_SQL = """
WITH bad AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events WHERE event_id % 37 = 0
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_micros,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       (SELECT c FROM bad) AS n_corrupt
FROM events WHERE event_id % 37 <> 0
GROUP BY event_type
"""

ROUND3.update({
    "q61_jsonl_ingest": (q61_jsonl_ingest, Q61_SQL),
})

# ---------------------------------------------------------------- q62

_Q62_N_WIN = 40      # maintenance windows: start = t0 + i*17h, length 9h


def q62_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Batch interval (range-containment) join, bucketized: events counted
    into overlapping maintenance windows.

    The naive formulation — join on `ts BETWEEN w_start AND w_end` — has
    no equi-key, so Spark plans a broadcast nested loop: every event
    row probed against every window, O(|events|·|windows|) at 100 TB.
    The scale pattern: bucket BOTH sides by calendar day (windows explode
    to the days they touch — bounded fan-out because window length is
    bounded), equi-join on the day, then apply the precise containment
    as a post-filter. The join becomes a hash join on a bounded key,
    pinned by tests/test_plans.py (no BroadcastNestedLoop, no cartesian).
    Distinct users per window via the pair-grain pre-aggregation (no
    Expand — same discipline as q42/q58).
    """
    win = spark.range(_Q62_N_WIN).select(
        F.col("id").alias("win_id"),
        F.expr("timestamp'2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, id * 17, 0, 0)").alias("w_start"),
        F.expr("timestamp'2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, id * 17 + 9, 0, 0)").alias("w_end"))
    win_days = win.select(
        "win_id", "w_start", "w_end",
        F.explode(F.sequence(F.to_date("w_start"), F.to_date("w_end")))
        .alias("day"))
    ev = (t(spark, sf, "events")
          .select("user_id", "ts", F.to_date("ts").alias("day")))
    hits = (ev.join(F.broadcast(win_days), "day")
            .filter((F.col("ts") >= F.col("w_start"))
                    & (F.col("ts") < F.col("w_end"))))
    per_pair = (hits.groupBy("win_id", "w_start", "user_id")
                .agg(F.count("*").alias("cnt")))
    return (per_pair.groupBy("win_id", "w_start")
            .agg(F.sum("cnt").alias("n_events"),
                 F.count("*").cast("long").alias("n_users")))


Q62_SQL = f"""
WITH win AS (
  SELECT i AS win_id,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 17 HOUR AS w_start,
         TIMESTAMP '2024-01-01 00:00:00' + (i * 17 + 9) * INTERVAL 1 HOUR
           AS w_end
  FROM (SELECT unnest(generate_series(0, {_Q62_N_WIN - 1})) AS i)
),
hits AS (
  SELECT w.win_id, w.w_start, e.user_id
  FROM events e JOIN win w
    ON e.ts >= w.w_start AND e.ts < w.w_end
)
SELECT win_id, w_start, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM hits GROUP BY win_id, w_start
"""

ROUND3.update({
    "q62_interval_join": (q62_interval_join, Q62_SQL),
})

# ---------------------------------------------------------------- d42


def d42_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Custom aggregation through the sanctioned escape hatch: weighted
    median per event type as an Arrow-batched GROUPED_AGG pandas UDF.

    The demonstration case for semantics outside the built-in aggregate
    set (per-key custom models, business-rule accumulators): Spark plans
    AggregateInPandas — each group's (value, weight) columns arrive as
    Arrow arrays, one Python call per group, no per-row interpreter
    round-trips. Weighted median = smallest value whose cumulative weight
    reaches half the total (per-distinct-value cumulation, so within-tie
    row order cannot matter); weights derive from user_id so the oracle
    recomputes them. The SQL twin is a RANGE-frame window cumsum —
    expressible, but the UDF path is what generalizes when the
    accumulator is not.
    """
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # stringifies hints, so signature inference can't see pd.Series here
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmedian(v, w):
        per_val = (pd.DataFrame({"v": v, "w": w})
                   .groupby("v", sort=True)["w"].sum())
        cum = per_val.cumsum()
        total = int(cum.iloc[-1])
        return float(cum.index[(2 * cum) >= total][0])

    ev = t(spark, sf, "events").select(
        "event_type", "value",
        (F.pmod("user_id", F.lit(7)) + 1).cast("long").alias("w"))
    # a GROUPED_AGG UDF cannot mix with JVM aggregates in one agg();
    # total_weight comes from a separate JVM-side rollup joined back
    med = ev.groupBy("event_type").agg(wmedian("value", "w").alias("w_median"))
    tot = ev.groupBy("event_type").agg(F.sum("w").alias("total_weight"))
    return med.join(tot, "event_type")


D42_SQL = """
WITH t AS (
  SELECT event_type, value, (user_id % 7) + 1 AS w FROM events
),
c AS (
  SELECT event_type, value,
         SUM(w) OVER (PARTITION BY event_type ORDER BY value
                      RANGE UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY event_type) AS tot
  FROM t
)
SELECT event_type,
       MIN(value) FILTER (2 * cum >= tot) AS w_median,
       CAST((SELECT SUM((user_id % 7) + 1) FROM events e2
             WHERE e2.event_type = c.event_type) AS BIGINT)
         AS total_weight
FROM c GROUP BY event_type
"""

ROUND3.update({
    "d42_weighted_median": (d42_weighted_median, D42_SQL),
})

# ---------------------------------------------------------------- s12


def s12_stream_jsonl_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING file ingest with bad-record accounting: the q61 drop dir
    (JSONL, ~1/37 lines truncated) consumed through the streaming engine
    in three micro-batches, corrupt lines folded into a '_CORRUPT' group
    of the same aggregation — one stream, no second scan.

    Streaming PERMISSIVE parsing uses the same corrupt-record column as
    the batch reader (sources/files.py); equality with the batch filter
    twin proves the stream parsed every good line, rejected every bad
    one, and counted each exactly once across batches.
    """
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.sources.files import CORRUPT_COL

    ev = t(spark, sf, "events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("micros"))
    payload = F.to_json(F.struct("event_id", "event_type", "micros"))
    line = F.when(F.pmod("event_id", F.lit(37)) == 0,
                  F.concat(F.lit('{"event_id":'),
                           F.col("event_id").cast("string"))
                  ).otherwise(payload)
    work = tempfile.mkdtemp(prefix="s12_")
    try:
        # three files -> three micro-batches (maxFilesPerTrigger=1)
        (ev.select(line.alias("value"))
         .repartitionByRange(3, "event_id")
         .write.mode("overwrite").text(work))
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("micros", T.LongType()),
            T.StructField(CORRUPT_COL, T.StringType()),
        ])
        stream = (spark.readStream.schema(schema)
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", CORRUPT_COL)
                  .option("maxFilesPerTrigger", "1")
                  .json(work))
        grouped = (stream
                   .select(F.when(F.col(CORRUPT_COL).isNotNull(),
                                  F.lit("_CORRUPT"))
                           .otherwise(F.col("event_type")).alias("grp"),
                           F.coalesce("micros", F.lit(0)).alias("micros"))
                   .groupBy("grp")
                   .agg(F.count("*").alias("n_lines"),
                        F.sum("micros").alias("sum_micros")))
        name = f"s12_sink_{abs(hash(sf)) % 10 ** 8}"
        with stream_state_partitions(spark, 4):
            q = (grouped.writeStream.outputMode("complete").format("memory")
                 .queryName(name).trigger(availableNow=True).start())
            q.awaitTermination(300)
            q.stop()
        return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


S12_SQL = """
SELECT CASE WHEN event_id % 37 = 0 THEN '_CORRUPT' ELSE event_type END
         AS grp,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN event_id % 37 = 0 THEN 0
                     ELSE CAST(round(value * 100, 0) AS BIGINT) END)
            AS BIGINT) AS sum_micros
FROM events GROUP BY 1
"""

ROUND3.update({
    "s12_stream_jsonl_ingest": (s12_stream_jsonl_ingest, S12_SQL),
})

# ---------------------------------------------------------------- q63


def q63_set_operations(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI set-operation surface: INTERSECT and EXCEPT (set semantics)
    over customer key sets, with the counts of each region surfaced.

    Catalyst compiles INTERSECT to a left-semi and EXCEPT to a left-anti
    join over distinct inputs — the same physical shapes as q04/q05, but
    the declarative set-op form is its own API surface (and dedups both
    sides first, which the raw joins do not). Sets: customers with 1995
    orders vs customers with URGENT-priority orders ever.
    """
    t(spark, sf, "orders").createOrReplaceTempView("q63_orders")
    return spark.sql("""
        WITH o95 AS (
          SELECT o_custkey FROM q63_orders
          WHERE o_orderdate >= DATE'1995-01-01'
            AND o_orderdate < DATE'1996-01-01'
        ),
        urgent AS (
          SELECT o_custkey FROM q63_orders
          WHERE o_orderpriority = '1-URGENT'
        )
        SELECT 'both' AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM (SELECT * FROM o95 INTERSECT SELECT * FROM urgent)
        UNION ALL
        SELECT '1995_only', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT * FROM o95 EXCEPT SELECT * FROM urgent)
        UNION ALL
        SELECT 'urgent_only', CAST(COUNT(*) AS BIGINT)
        FROM (SELECT * FROM urgent EXCEPT SELECT * FROM o95)
    """)


Q63_SQL = """
WITH o95 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1995-01-01'
    AND o_orderdate < DATE '1996-01-01'
),
urgent AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT 'both' AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM (SELECT * FROM o95 INTERSECT SELECT * FROM urgent)
UNION ALL
SELECT '1995_only', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM o95 EXCEPT SELECT * FROM urgent)
UNION ALL
SELECT 'urgent_only', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM urgent EXCEPT SELECT * FROM o95)
"""

# ---------------------------------------------------------------- q64


def q64_mode_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-set aggregation with PINNED tie-breaking: the modal order
    priority per order status, plus its frequency and share.

    Engine mode() functions break frequency ties arbitrarily (Spark's
    mode() and DuckDB's mode() may disagree), so the deterministic form
    is count + rank with an explicit lexicographic tiebreak — the only
    portable contract, and the same cost (one narrow rollup + a
    per-group top-1).
    """
    o = t(spark, sf, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority"))
    tot = (o.groupBy("o_orderstatus")
           .agg(F.count("*").alias("total")))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn")
            .join(tot, "o_orderstatus")
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("modal_priority"),
                    F.col("cnt").alias("n_orders"),
                    F.expr("cnt * 1000000L div total")
                    .cast("long").alias("share_ppm")))


Q64_SQL = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT o_orderstatus, COUNT(*) AS total FROM orders GROUP BY 1
)
SELECT c.o_orderstatus, c.o_orderpriority AS modal_priority,
       c.cnt AS n_orders,
       CAST(c.cnt * 1000000 // t.total AS BIGINT) AS share_ppm
FROM counts c JOIN tot t USING (o_orderstatus)
QUALIFY row_number() OVER (PARTITION BY c.o_orderstatus
                           ORDER BY c.cnt DESC, c.o_orderpriority) = 1
"""

ROUND3.update({
    "q63_set_operations": (q63_set_operations, Q63_SQL),
    "q64_mode_per_group": (q64_mode_per_group, Q64_SQL),
})

# ---------------------------------------------------------------- q65


def q65_ohlc_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series resample to OHLC bars: per (event_type, day) the
    opening/closing/high/low `value` — the financial-rollup shape every
    metrics store serves.

    Open/close are order statistics over TIME, not values: they need a
    deterministic event ordering, pinned here as (ts, event_id) — without
    the event_id tiebreak, same-microsecond events make open/close
    engine-dependent. The composite key is a zero-padded string (both
    engines order it identically; DuckDB's arg_min takes no struct key).
    One shuffle: min_by/max_by over the key, high/low/count ride the
    same aggregation.
    """
    ev = t(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day"),
        F.format_string("%020d:%012d", F.unix_micros("ts"),
                        F.col("event_id")).alias("ord"),
        "value")
    return (ev.groupBy("event_type", "day")
            .agg(F.min_by("value", "ord").alias("open"),
                 F.max_by("value", "ord").alias("close"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.count("*").alias("n_events")))


Q65_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       arg_min(value, printf('%020d:%012d', epoch_us(ts), event_id))
         AS open,
       arg_max(value, printf('%020d:%012d', epoch_us(ts), event_id))
         AS close,
       MAX(value) AS high, MIN(value) AS low,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""

ROUND3.update({
    "q65_ohlc_resample": (q65_ohlc_resample, Q65_SQL),
})

# ---------------------------------------------------------------- d43

_D43_N = 4           # same n-gram order as d19
_D43_PPM = 20_000    # eject from train above 2% eval-gram overlap


def d43_clean_split(spark: SparkSession, sf: str) -> DataFrame:
    """Contamination-aware corpus split: d37's hash assignment composed
    with d19's eval-overlap probe — a would-be TRAIN document whose
    eval-4-gram overlap exceeds the threshold is ejected to 'quarantine'
    instead (val/test keep their assignment; holding out eval look-alikes
    from eval would bias it the other way). The hygiene pass every
    pre-training pipeline runs between splitting and training.

    Scale shape inherited from both parents: eval grams broadcast
    (benchmarks are MBs vs 100 TB), the corpus is probed without
    shuffling, and the split is a pure per-row hash. Output: per (lang,
    final split) doc count and char mass — the gate proves the
    composition end-to-end.
    """
    from etl_docker_spark.llm.dedup import shingle_rows

    docs = t(spark, sf, "documents")
    sh = (shingle_rows(docs, "doc_id", "text", _D43_N)
          .withColumnRenamed("doc", "doc_id")
          .distinct())
    is_eval = F.pmod("doc_id", F.lit(20)) == 0
    eval_grams = sh.filter(is_eval).select(F.col("s").alias("g")).distinct()
    w = Window.partitionBy("doc_id")
    corpus_sh = (sh.filter(~is_eval)
                 .select("doc_id",
                         F.count("*").over(w).cast("long").alias("total"),
                         F.col("s").alias("g")))
    contaminated = (corpus_sh.join(F.broadcast(eval_grams), "g")
                    .groupBy("doc_id", "total")
                    .agg(F.count("*").alias("shared"))
                    .filter(F.expr("(1000000 * shared) div total")
                            >= _D43_PPM)
                    .select("doc_id"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
    bucket = F.pmod(h, F.lit(100))
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    assigned = (docs.filter(~is_eval)
                .select("doc_id", "lang", "n_chars", split.alias("split"))
                .join(F.broadcast(contaminated.withColumn(
                    "is_dirty", F.lit(True))), "doc_id", "left"))
    final = (F.when((F.col("split") == "train") & F.col("is_dirty"),
                    "quarantine").otherwise(F.col("split")))
    return (assigned.select("lang", final.alias("split"), "n_chars")
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


D43_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {_D43_N - 1}, 1)),
             i -> array_to_string(tk[i:i+{_D43_N - 1}], ' '))) AS sh
  FROM toks
),
ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 20 = 0
),
cg AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS total, unnest(sh) AS g
  FROM sh WHERE doc_id % 20 != 0
),
dirty AS (
  SELECT doc_id FROM (
    SELECT doc_id, total, COUNT(*) AS shared
    FROM cg JOIN ev USING (g) GROUP BY doc_id, total
  ) WHERE (1000000 * shared) // total >= {_D43_PPM}
),
assigned AS (
  SELECT d.lang, d.n_chars,
         CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) % 100 < 80
              THEN 'train'
              WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 8) AS BIGINT) % 100 < 90
              THEN 'val' ELSE 'test' END AS split,
         (dirty.doc_id IS NOT NULL) AS is_dirty
  FROM documents d LEFT JOIN dirty ON d.doc_id = dirty.doc_id
  WHERE d.doc_id % 20 != 0
)
SELECT lang,
       CASE WHEN split = 'train' AND is_dirty THEN 'quarantine'
            ELSE split END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY 1, 2
"""

ROUND3.update({
    "d43_clean_split": (d43_clean_split, D43_SQL),
})

# ---------------------------------------------------------------- q66

_Q66_WINDOW_US = 3_600_000_000  # 1h attribution lookback


def q66_last_touch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase credits the
    LAST non-purchase event by the same user within the preceding hour;
    purchases with no touch in window count as 'direct'.

    One analytic pass: per-user time order (tiebroken by event_id), an
    IGNORE NULLS last_value over the preceding frame carries the latest
    touch forward, and the lookback bound is a microsecond comparison —
    no self-join, no per-purchase probe. Exactly one credit per purchase
    (conservation is part of the gate: SUM(n_purchases) is invariant).
    """
    ev = t(spark, sf, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"))
    w = (Window.partitionBy("user_id")
         .orderBy("us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.last(
        F.when(F.col("event_type") != "purchase",
               F.struct(F.col("us").alias("t_us"),
                        F.col("event_type").alias("t_type"))),
        ignorenulls=True).over(w)
    credited = (ev.withColumn("touch", touch)
                .filter(F.col("event_type") == "purchase")
                .select(F.when(
                    F.col("touch").isNotNull()
                    & (F.col("us") - F.col("touch.t_us")
                       <= _Q66_WINDOW_US),
                    F.col("touch.t_type")).otherwise("direct")
                    .alias("credited_to")))
    return (credited.groupBy("credited_to")
            .agg(F.count("*").alias("n_purchases")))


Q66_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_type, us,
         last_value(CASE WHEN event_type <> 'purchase'
                         THEN struct_pack(t_us := us, t_type := event_type)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM ev
)
SELECT CASE WHEN touch IS NOT NULL
             AND us - touch.t_us <= {_Q66_WINDOW_US}
            THEN touch.t_type ELSE 'direct' END AS credited_to,
       COUNT(*) AS n_purchases
FROM flagged WHERE event_type = 'purchase'
GROUP BY 1
"""

ROUND3.update({
    "q66_last_touch_attribution": (q66_last_touch_attribution, Q66_SQL),
})

# ---------------------------------------------------------------- e18

_E18_NQ = 8
_E18_K = 5


def e18_tombstone_search(spark: SparkSession, sf: str) -> DataFrame:
    """Index-maintenance part 2: serving a trained ANN index under a
    DELETION SET without rebuilding it.

    Deletes against a trained index are tombstones (vec_id % 13 == 0
    here): the index keeps the rows, the serving path excludes them with
    a broadcast anti-join on the candidate stream BEFORE ranking — so
    rank k is recomputed over survivors (post-filtering a stored top-k
    would starve k), and the trained artifact is untouched. Pairs with
    e17 (occupancy rebalance): together they are the compact-later,
    serve-correct-now contract of a production vector index.
    """
    from etl_docker_spark.llm.similarity import dot_expr, norm2_expr
    from etl_docker_spark.plans.round2 import e05_assignments

    assign = e05_assignments(spark, sf)
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm2_expr(F.col("embedding")).alias("n2"))
    ea = e.join(assign, "vec_id")
    tombstones = (ea.filter(F.pmod("vec_id", F.lit(13)) == 0)
                  .select("vec_id"))
    q = (ea.filter(F.col("vec_id") < _E18_NQ)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv"),
                 F.col("n2").alias("qn2"), "cluster"))
    cand = (ea.join(F.broadcast(tombstones), "vec_id", "left_anti")
            .join(F.broadcast(q), "cluster")
            .filter(F.col("vec_id") != F.col("query_id")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (dot_expr(F.col("qv"), F.col("embedding"))
         / F.sqrt(F.col("qn2") * F.col("n2"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _E18_K)
            .select("query_id", "neighbor_id",
                    F.round("cosine", 8).alias("cosine"), "rank"))


def _e18_sql() -> str:
    from etl_docker_spark.plans.round2 import _DOT2, _E05_BODY

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
q AS (
  SELECT vec_id AS query_id, embedding AS qv, n2 AS qn2, cluster
  FROM ea WHERE vec_id < {_E18_NQ}
),
scored AS (
  SELECT q.query_id, ea.vec_id AS neighbor_id,
         {_DOT2.format(a='q.qv', b='ea.embedding')}
           / sqrt(q.qn2 * ea.n2) AS cos_raw
  FROM ea JOIN q ON ea.cluster = q.cluster AND ea.vec_id <> q.query_id
  WHERE ea.vec_id % 13 <> 0
)
SELECT query_id, neighbor_id, round(cos_raw, 8) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {_E18_K}
"""

# ---------------------------------------------------------------- q67

_Q67_BINS = 20
_Q67_LO, _Q67_HI = 0.0, 500.0


def q67_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-bin histogram per event type (width_bucket): bin index,
    count, and exact decimal bin mass — the profiling scan behind every
    histogram/NDV dashboard panel, as one map-side-combined aggregation.
    Out-of-range values land in the engine-standard under/overflow bins
    (0 and n+1), so the histogram is total: counts sum to the table.
    """
    ev = t(spark, sf, "events")
    bin_ = F.width_bucket("value", F.lit(_Q67_LO), F.lit(_Q67_HI),
                          F.lit(_Q67_BINS))
    return (ev.groupBy("event_type", bin_.cast("long").alias("bin"))
            .agg(F.count("*").alias("n_events"),
                 dsum("value").alias("bin_mass")))


# DuckDB has no width_bucket; the oracle mirrors Spark's arithmetic
# operand-for-operand (floor((v - lo) / width) + 1, width exactly
# representable) so boundary values bin identically in both engines.
_Q67_WIDTH = (_Q67_HI - _Q67_LO) / _Q67_BINS

Q67_SQL = f"""
SELECT event_type,
       CAST(CASE WHEN value < {_Q67_LO} THEN 0
                 WHEN value >= {_Q67_HI} THEN {_Q67_BINS + 1}
                 ELSE floor((value - {_Q67_LO}) / {_Q67_WIDTH}) + 1
            END AS BIGINT) AS bin,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
         AS bin_mass
FROM events GROUP BY 1, 2
"""

ROUND3.update({
    "e18_tombstone_search": (e18_tombstone_search, _e18_sql()),
    "q67_value_histogram": (q67_value_histogram, Q67_SQL),
})

# ---------------------------------------------------------------- q68


def q68_rest_paginated_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The paginated REST source (SURVEY S1-S4) under the oracle gate.

    Runs the EXECUTOR fetch path (sources.rest.paginated_read: page rows
    fanned across tasks, each task walking its slice via mapInPandas)
    against the deterministic windowed fake endpoint — the modified-items
    window 2024-03-10..2024-03-13 with as-of semantics. The feed is a
    fixed fixture, so the oracle is its expected row set as a VALUES
    literal: equality proves pagination (4 pages x 3 rows), predicate ->
    param pushdown, executor-side assembly, and the as-of rule (item 1
    arrives as its deletion snapshot; item 2 as its third revision)
    end-to-end through the driver's gate. `sf` is unused — the endpoint
    IS the source.
    """
    from etl_docker_spark.pipelines.incremental import ITEMS_WINDOWED
    from etl_docker_spark.sources.fake_api import fetch_items_windowed
    from etl_docker_spark.sources.rest import paginated_read

    df = paginated_read(
        spark, ITEMS_WINDOWED, fetch_items_windowed, num_pages=4,
        predicates={"field": "modified", "date_from": "2024-03-10",
                    "date_to": "2024-03-13"})
    return df.select(
        "Id", "Code", "Description", "ModificationDatetime",
        F.col("DeletionDatetime").isNotNull().alias("is_deleted"))


Q68_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'SKU-1', 'alpha v1', '2024-03-10', TRUE),
  (CAST(2 AS BIGINT), 'SKU-2', 'beta v3', '2024-03-13', FALSE),
  (CAST(3 AS BIGINT), 'SKU-3', 'gamma v2', '2024-03-12', FALSE),
  (CAST(4 AS BIGINT), 'SKU-4', 'delta v1', '2024-03-11', TRUE),
  (CAST(5 AS BIGINT), 'SKU-5', 'eps v1', '2024-03-12', FALSE),
  (CAST(6 AS BIGINT), 'SKU-6', 'zeta v1', '2024-03-13', FALSE)
) AS t(Id, Code, Description, ModificationDatetime, is_deleted)
"""

ROUND3.update({
    "q68_rest_paginated_ingest": (q68_rest_paginated_ingest, Q68_SQL),
})

# ---------------------------------------------------------------- q69


def q69_dag_audit_trail(spark: SparkSession, sf: str) -> DataFrame:
    """Orchestration (O1/O3/O4/O6) under the oracle gate: a four-task DAG
    with a REST-fed load, a deliberately failing task that succeeds on
    RETRY, a permanently failing task, and a dependent task that must be
    SKIPPED — gated on the resulting audit trail.

    The audit log is the orchestration contract (one row per attempt
    outcome, reference CotyData_IPN.py:19-61): the VALUES oracle pins
    ordering-independent rows for load counts, retry success, failure
    recording, and dependency-skip — proving the DAG semantics
    end-to-end rather than via unit asserts. `sf` is unused.
    """
    import shutil
    import tempfile

    from etl_docker_spark.orchestration import JobContext, Task, run_dag
    from etl_docker_spark.pipelines.incremental import ITEMS_WINDOWED
    from etl_docker_spark.sources.fake_api import fetch_items_windowed
    from etl_docker_spark.sources.rest import paginated_read_driver

    work = tempfile.mkdtemp(prefix="q69_")
    try:
        ctx = JobContext(spark=spark, warehouse=f"{work}/wh",
                         log_path=f"{work}/audit",
                         quarantine=f"{work}/quar")

        def load_items(c: JobContext) -> int:
            df = paginated_read_driver(
                c.spark, ITEMS_WINDOWED, fetch_items_windowed,
                predicates={"field": "created", "date_from": "2024-03-10",
                            "date_to": "2024-03-13"})
            df.write.mode("overwrite").parquet(f"{c.warehouse}/items")
            return df.count()

        flaky_state = {"calls": 0}

        def flaky(c: JobContext) -> int:
            flaky_state["calls"] += 1
            if flaky_state["calls"] == 1:
                raise RuntimeError("transient")
            return 1

        def always_fails(c: JobContext) -> int:
            raise ValueError("permanent schema drift")

        run_dag(ctx, [
            Task("load_items", load_items, retries=0),
            Task("flaky_enrich", flaky, retries=1, retry_delay_s=0.0),
            Task("broken_load", always_fails, retries=0),
            Task("downstream_agg", lambda c: 0, retries=0,
                 depends_on=("broken_load",)),
        ])
        audit = spark.read.parquet(ctx.log_path)
        out = (audit.select(
            "load_table", "status_ok", "inserted_rows",
            F.col("error_msg").isNotNull().alias("has_error"))
            .localCheckpoint())  # pin before the workdir is deleted
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


Q69_SQL = """
SELECT * FROM (VALUES
  ('load_items', TRUE, CAST(6 AS BIGINT), FALSE),
  ('flaky_enrich', TRUE, CAST(1 AS BIGINT), FALSE),
  ('broken_load', FALSE, CAST(0 AS BIGINT), TRUE),
  ('downstream_agg', FALSE, CAST(NULL AS BIGINT), TRUE)
) AS t(load_table, status_ok, inserted_rows, has_error)
"""

ROUND3.update({
    "q69_dag_audit_trail": (q69_dag_audit_trail, Q69_SQL),
})

# ---------------------------------------------------------------- d44


def d44_vocab_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary concentration per language: how few token types cover
    50% / 90% of all token occurrences — the integer-exact form of the
    Zipf head/tail diagnostic (a fitted slope needs cross-engine libm
    log(), which is NOT bit-portable; coverage thresholds are pure
    integer cumulative sums and answer the same curation question:
    how head-heavy is this corpus slice).

    One scan collapses to (lang, token type, count); the cumulative sum
    runs over types ranked by (count desc, token) — total-ordered so the
    threshold crossing is engine-independent.
    """
    toks = (t(spark, sf, "documents")
            .select("lang", F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.length("tok") > 0))
    tf = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    ranked = (tf.withColumn("cum", F.sum("c").over(
        w.rowsBetween(Window.unboundedPreceding, 0))))
    totals = tf.groupBy("lang").agg(
        F.sum("c").alias("total_occurrences"),
        F.count("*").alias("n_types"))
    j = ranked.join(totals, "lang")
    return (j.groupBy("lang", "total_occurrences", "n_types")
            .agg(F.sum(F.when(2 * F.col("cum")
                              < F.col("total_occurrences"), 1)
                       .otherwise(0)).alias("_below50"),
                 F.sum(F.when(10 * F.col("cum")
                              < 9 * F.col("total_occurrences"), 1)
                       .otherwise(0)).alias("_below90"))
            .select("lang",
                    F.col("total_occurrences").cast("long")
                    .alias("total_occurrences"),
                    F.col("n_types").cast("long").alias("n_types"),
                    (F.col("_below50") + 1).cast("long")
                    .alias("types_for_50pct"),
                    (F.col("_below90") + 1).cast("long")
                    .alias("types_for_90pct")))


D44_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (
  SELECT lang, tok, COUNT(*) AS c FROM toks
  WHERE length(tok) > 0 GROUP BY 1, 2
),
ranked AS (
  SELECT lang, c,
         SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, tok
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM tf
),
totals AS (
  SELECT lang, SUM(c) AS total_occurrences, COUNT(*) AS n_types
  FROM tf GROUP BY lang
)
SELECT r.lang,
       CAST(t.total_occurrences AS BIGINT) AS total_occurrences,
       CAST(t.n_types AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN 2 * r.cum < t.total_occurrences
                     THEN 1 ELSE 0 END) + 1 AS BIGINT)
         AS types_for_50pct,
       CAST(SUM(CASE WHEN 10 * r.cum < 9 * t.total_occurrences
                     THEN 1 ELSE 0 END) + 1 AS BIGINT)
         AS types_for_90pct
FROM ranked r JOIN totals t USING (lang)
GROUP BY 1, 2, 3
"""

ROUND3.update({
    "d44_vocab_concentration": (d44_vocab_concentration, D44_SQL),
})

# ---------------------------------------------------------------- g04

_G04_K = 3        # core order
_G04_ROUNDS = 3   # bounded unrolled peel rounds (oracle-expressible)


def g04_kcore_peel(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded k-core decomposition on the co-trade graph: three unrolled
    peel rounds (drop nodes with degree < k, induce, repeat), reporting
    surviving nodes and edges after each round.

    k-core is the standard graph-density filter (spam rings, community
    cores). Full peeling is a data-dependent-depth loop (g01/g03's
    iterate-with-cap machinery); the BOUNDED form used here is exactly
    expressible in one static plan on BOTH engines — each round is a
    degree rollup plus two semi-joins against the survivor set, and the
    mutual-top-K construction bounds every degree by K so each round's
    work only shrinks. Convergence inside the bound shows up in the
    output itself (two equal consecutive rounds == fixpoint).
    """
    from etl_docker_spark.plans.round2j import cotrade_edges

    edges = cotrade_edges(spark, sf)
    cur = edges
    rounds = []
    for r in range(1, _G04_ROUNDS + 1):
        deg = (cur.select(F.col("a").alias("node"))
               .unionAll(cur.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count("*").alias("deg")))
        alive = deg.filter(F.col("deg") >= _G04_K).select("node")
        cur = (cur.join(alive.withColumnRenamed("node", "a"), "a",
                        "left_semi")
               .join(alive.withColumnRenamed("node", "b"), "b",
                     "left_semi"))
        rounds.append(
            alive.agg(F.count("*").cast("long").alias("n_nodes"))
            .crossJoin(cur.agg(F.count("*").cast("long").alias("n_edges")))
            .select(F.lit(r).cast("long").alias("round"),
                    "n_nodes", "n_edges"))
    out = rounds[0]
    for r_df in rounds[1:]:
        out = out.unionByName(r_df)
    return out


def _g04_sql() -> str:
    from etl_docker_spark.plans.round2j import _G02_K

    parts = [f"""
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
e0 AS (
  SELECT s1 AS a, s2 AS b
  FROM (SELECT s1, s2 FROM top
        INTERSECT SELECT s2 AS s1, s1 AS s2 FROM top)
  WHERE s1 < s2
)"""]
    for r in range(1, _G04_ROUNDS + 1):
        parts.append(f""",
deg{r} AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM e{r - 1}
    UNION ALL SELECT b AS node FROM e{r - 1}
  ) GROUP BY node
),
alive{r} AS (SELECT node FROM deg{r} WHERE deg >= {_G04_K}),
e{r} AS (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN alive{r} x ON e.a = x.node
  JOIN alive{r} y ON e.b = y.node
)""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM alive{r}) AS n_nodes, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges"
        for r in range(1, _G04_ROUNDS + 1))
    parts.append("\n" + union)
    return "".join(parts)


ROUND3.update({
    "g04_kcore_peel": (g04_kcore_peel, _g04_sql()),
})

# ---------------------------------------------------------------- d45


def d45_dedup_method_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Detector agreement audit: the MinHash-LSH near-dup pair set (d06)
    vs the SimHash pair set (d11) as a confusion summary — how many pairs
    each method finds, how many both find, and per-method exclusives.

    The evaluation every production dedup stack runs before trusting one
    detector at 100 TB: methods have different recall surfaces (token
    shingles vs weighted-feature bits), and their OVERLAP is the
    high-confidence kill set while the exclusives price each method's
    marginal contribution. Both pair frames are memoized index artifacts
    (d06's via the pair-graph memo, d11 recomputed off the fingerprint
    table), so this audit costs two tiny set ops on a warm session.
    """
    from etl_docker_spark.plans.advanced import d11_simhash_pairs
    from etl_docker_spark.plans.llm_queries import minhash_pairs_frame

    m = minhash_pairs_frame(spark, sf).select("doc_a", "doc_b")
    s = d11_simhash_pairs(spark, sf).select("doc_a", "doc_b")
    both = m.join(s, ["doc_a", "doc_b"])
    return (m.agg(F.count("*").cast("long").alias("n_minhash"))
            .crossJoin(s.agg(F.count("*").cast("long").alias("n_simhash")))
            .crossJoin(both.agg(F.count("*").cast("long").alias("n_both")))
            .select("n_minhash", "n_simhash", "n_both",
                    (F.col("n_minhash") - F.col("n_both"))
                    .alias("minhash_only"),
                    (F.col("n_simhash") - F.col("n_both"))
                    .alias("simhash_only")))


def _d45_sql() -> str:
    from etl_docker_spark.plans.advanced import D11_SQL
    from etl_docker_spark.plans.llm_queries import D06_SQL

    # DuckDB allows WITH-bearing statements as parenthesized subqueries,
    # so each method's full oracle body nests verbatim — no duplication
    # of the pair-construction logic.
    return f"""
WITH m AS (SELECT doc_a, doc_b FROM ({D06_SQL})),
s AS (SELECT doc_a, doc_b FROM ({D11_SQL})),
b AS (SELECT m.doc_a, m.doc_b FROM m JOIN s USING (doc_a, doc_b))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_minhash,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_simhash,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_both,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM m)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS minhash_only,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS simhash_only
"""


ROUND3.update({
    "d45_dedup_method_agreement": (d45_dedup_method_agreement, _d45_sql()),
})
