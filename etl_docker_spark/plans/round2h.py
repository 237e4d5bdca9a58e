"""Round-2 eighth batch: sketches, substring-level dedup signals, tokenizer
training, and runtime-filter machinery.

- d28: mergeable HyperLogLog distinct sketch — per-language registers over
  3-gram shingles PLUS the cross-language merge (register-wise max), the
  property that makes HLL the 100 TB cardinality tool: partial sketches
  combine without rescanning. Deterministic variant (md5 bit source, exact
  integer registers, one double division at the end) so the DuckDB oracle
  pins every estimate bit-for-bit.
- d29: duplicated-span fraction — the ExactSubstr-style signal (Lee et al.
  2021, "Deduplicating Training Data Makes Language Models Better"): for
  each document, the fraction of its 10-token windows that occur anywhere
  else in the corpus (including elsewhere in the same document). Exact
  dedup (d01) misses near-misses; span overlap catches partial copies.
- d30: BPE tokenizer training, first 3 merges — the actual iterative loop
  (Sennrich et al.), not just d27's first-merge statistic: pick the
  highest-frequency adjacent symbol pair, merge it across all word types,
  recount, repeat. Merges apply leftmost-non-overlapping via plain string
  replace over a space-separated symbol encoding — identical semantics in
  any engine, no regex.
- q44: Bloom-filter runtime pruning — the engine-side mechanism behind
  Spark's runtime row-group skipping: build a deterministic k=2 Bloom
  filter over the orders build side, probe every customer, and report
  per-segment pass/true/false-positive counts. The gate pins the filter's
  exact contents; the false-positive column measures what a real
  runtime filter would leak at this bits/keys ratio.

Determinism discipline as everywhere (plans/_util.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_docker_spark.plans._util import t

# ---------------------------------------------------------------- d28

_HLL_M = 64                     # registers (6 bucket bits)
_HLL_RBITS = 54                 # 60-bit hash = 6 bucket + 54 rank bits
_HLL_RHO_MAX = _HLL_RBITS + 1   # rho(0) := 55
# alpha_64 * m^2 * 2^55 as ONE double literal: both engines parse the same
# repr, so the single double division below is IEEE-identical cross-engine
_HLL_ALPHA_NUM = repr(0.709 * _HLL_M * _HLL_M * float(2 ** _HLL_RHO_MAX))


def d28_hll_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct 3-gram estimate per language + the merged corpus sketch.

    Scale shape: the only corpus-sized work is one shingling pass; registers
    are a (lang, 64)-row frame built by ONE map-side-combined groupBy of
    (lang, bucket, rho) triples. The '*ALL*' row re-aggregates REGISTERS
    (register-wise max), not data — the mergeability that lets 1000
    executors sketch partitions independently and combine 64-number states.
    The exact_distinct column (a real distinct count, the expensive thing
    the sketch replaces) rides along so err_ppm is measured, not claimed.

    Exactness: md5-derived 60-bit hashes, integer rho via bit length,
    Z-denominator as an exact BIGINT sum of powers of two; the one double
    division happens on identical operands in both engines.
    """
    target = spark.sparkContext.defaultParallelism
    docs = t(spark, sf, "documents").select("doc_id", "lang", "text")
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target, "doc_id")
    toks = F.split(F.col("text"), " ")
    rows = docs.select(
        "doc_id", "lang", F.size(toks).alias("sz"),
        F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (rows.select(
        "lang", "pos", "sz",
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w),
                    F.lead("tok", 2).over(w)).alias("g"))
        .filter(F.col("pos") <= F.col("sz") - 3)
        .select("lang", "g"))
    # ONE corpus-width shuffle: collapse occurrences to (lang, gram-TYPE)
    # rows first, checkpoint the vocab-sized type table, and derive
    # registers AND both exact-distinct measurements from it. The previous
    # lazy-branch form re-ran the shingling pass 3x (registers + two
    # count_distincts, each of which shuffles gram strings anyway) and
    # paid one md5 per OCCURRENCE; this pays one md5 per type and was
    # measured 2x faster at ~sf1. (Unlike the simhash dictionary-encoding
    # negative result, nothing joins back to occurrences here — every
    # downstream consumer is type-level.)
    gtypes = (grams.groupBy("lang", "g").agg(F.count("*").alias("n"))
              .localCheckpoint())
    h = F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 15), 16, 10) \
        .cast("long")
    hashed = gtypes.select("lang", "n", h.alias("hv")).select(
        "lang", "n", (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("wv"))
    rho = (F.when(F.col("wv") == 0, F.lit(_HLL_RHO_MAX))
           .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(F.col("wv")))))
    rowsr = hashed.select("lang", "n", "bucket", rho.alias("rho"))

    reg = rowsr.groupBy("lang", "bucket").agg(F.max("rho").alias("m_rho"))
    reg_all = (reg.groupBy("bucket").agg(F.max("m_rho").alias("m_rho"))
               .select(F.lit("*ALL*").alias("lang"), "bucket", "m_rho"))
    regs = reg.unionByName(reg_all)

    ex = gtypes.groupBy("lang").agg(
        F.sum("n").alias("n_grams"),
        F.count("*").alias("exact_distinct"))
    gall = gtypes.groupBy("g").agg(F.sum("n").alias("n"))
    ex_all = gall.agg(
        F.sum("n").alias("n_grams"),
        F.count("*").alias("exact_distinct")) \
        .select(F.lit("*ALL*").alias("lang"), "n_grams", "exact_distinct")
    exs = ex.unionByName(ex_all)

    # empty registers contribute 2^RHO_MAX each — the fill is arithmetic
    # (M - observed registers), no bucket-completion join
    z = (regs.groupBy("lang")
         .agg((F.expr(f"sum(shiftleft(cast(1 as bigint),"
                      f" {_HLL_RHO_MAX} - m_rho))")
               + (F.lit(_HLL_M) - F.count("*"))
               * F.lit(1 << _HLL_RHO_MAX).cast("long")).alias("z")))
    s = exs.join(z, "lang")
    est = F.floor(F.lit(float(_HLL_ALPHA_NUM)) / F.col("z")).cast("long")
    return (s.withColumn("hll_estimate", est)
            .select(
                "lang", "n_grams", "exact_distinct", "hll_estimate",
                F.expr("abs(hll_estimate - exact_distinct) * 1000000"
                       " div exact_distinct").alias("err_ppm")))


D28_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
),
grams AS (
  SELECT lang, array_to_string(tk[i:i+2], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i)
),
hashed AS (
  SELECT lang, g,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % {_HLL_M} AS bucket,
         CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) // {_HLL_M} AS wv
  FROM grams
),
r AS (
  SELECT lang, g, bucket,
         CASE WHEN wv = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(wv)) END AS rho
  FROM hashed
),
reg AS (SELECT lang, bucket, MAX(rho) AS m_rho FROM r GROUP BY lang, bucket),
regs AS (
  SELECT * FROM reg
  UNION ALL
  SELECT '*ALL*' AS lang, bucket, MAX(m_rho) AS m_rho FROM reg GROUP BY bucket
),
ex AS (
  SELECT lang, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS exact_distinct
  FROM r GROUP BY lang
  UNION ALL
  SELECT '*ALL*', COUNT(*), COUNT(DISTINCT g) FROM r
),
z AS (
  SELECT lang,
         SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m_rho))
           + ({_HLL_M} - COUNT(*))
             * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX}) AS z
  FROM regs GROUP BY lang
),
s AS (
  SELECT ex.lang, ex.n_grams, ex.exact_distinct, z.z
  FROM ex JOIN z USING (lang)
),
est AS (
  SELECT lang, n_grams, exact_distinct,
         CAST(FLOOR({_HLL_ALPHA_NUM} / z) AS BIGINT) AS hll_estimate
  FROM s
)
SELECT lang, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(exact_distinct AS BIGINT) AS exact_distinct, hll_estimate,
       CAST(abs(hll_estimate - exact_distinct) * 1000000 // exact_distinct
            AS BIGINT) AS err_ppm
FROM est
"""

# ---------------------------------------------------------------- d29

_SPAN_N = 10


def d29_dup_span_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document duplicated-span fraction: of the document's 10-token
    windows, how many occur at any OTHER position in the corpus (same doc
    included — internal repetition is also a quality signal).

    Scale shape: one shingling pass (codegen lead-window under id-hash
    partitioning), then one shuffle of 16-byte digests for the global
    occurrence count (window over the digest partitioning), then one narrow
    groupBy(doc). The document text itself is never shuffled — only
    digests, the same discipline as d01/d06.
    """
    from etl_docker_spark.llm.dedup import shingle_rows

    docs = t(spark, sf, "documents").select("doc_id", "text")
    spans = shingle_rows(docs, "doc_id", "text", n=_SPAN_N)
    hashed = spans.select("doc", F.md5(F.col("s").cast("binary")).alias("h"))
    wc = Window.partitionBy("h")
    counted = hashed.select("doc", F.count("*").over(wc).alias("occ"))
    return (counted.groupBy(F.col("doc").alias("doc_id"))
            .agg(F.count("*").alias("n_spans"),
                 F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_spans"))
            .withColumn(
                "dup_span_ppm",
                F.expr("n_dup_spans * 1000000 div n_spans")))


D29_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
spans AS (
  SELECT doc_id,
         md5(array_to_string(tk[i:i+{_SPAN_N - 1}], ' ')) AS h
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(tk) - {_SPAN_N - 1}, 1)))
        AS i)
),
counted AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS occ FROM spans
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans,
       CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           * 1000000 // COUNT(*) AS dup_span_ppm
FROM counted GROUP BY doc_id
"""

# ---------------------------------------------------------------- d30

_BPE_STEPS = 3


def d30_bpe_merge_steps(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer training, first 3 merge steps: (step, p1, p2,
    pair_count) for each chosen merge — the iterative loop d27's one-shot
    statistic feeds (Sennrich et al. 2016).

    Word types encode as space-separated symbol strings (' l o w '); a
    merge is a plain string replace of ' p1 p2 ' with ' p1p2 ' — leftmost
    non-overlapping in every engine, so 'a a a' under merge (a,a) yields
    ['aa','a'] exactly as reference BPE does. Each step's pair count
    aggregates over word TYPES weighted by frequency (the vocabulary frame,
    orders of magnitude smaller than the token stream — it is
    localCheckpoint'ed once and each step's merge is a broadcast of the
    single winning pair). The corpus is scanned exactly once.
    """
    wf = (t(spark, sf, "documents")
          .select(F.explode(F.split("text", " ")).alias("w"))
          .filter(F.length("w") >= 2)
          .groupBy("w").agg(F.count("*").alias("f"))
          .select(F.concat(F.lit(" "),
                           F.regexp_replace("w", "(.)", "$1 ")).alias("sp"),
                  "f")
          .localCheckpoint())
    steps: list[DataFrame] = []
    cur = wf
    for step in range(1, _BPE_STEPS + 1):
        syms = F.split(F.trim(F.col("sp")), " ")
        prs = (cur.filter(F.size(syms) >= 2)
               .select("f", F.explode(F.transform(
                   F.sequence(F.lit(1), F.size(syms) - 1),
                   lambda i: F.struct(
                       F.element_at(syms, i).alias("p1"),
                       F.element_at(syms, i + 1).alias("p2"))))
                   .alias("pr"))
               .select(F.col("pr.p1").alias("p1"),
                       F.col("pr.p2").alias("p2"), "f"))
        agg = prs.groupBy("p1", "p2").agg(F.sum("f").alias("pair_count"))
        # top-1 as a one-row min(struct(...)) aggregate (the d54 round-8
        # rewrite): same winner by lexicographic struct comparison
        # (-pair_count asc == pair_count desc, then p1, p2 asc), zero
        # WindowExec nodes
        top = (agg.agg(F.min(F.struct(
                   (-F.col("pair_count")).alias("neg"),
                   F.col("p1").alias("p1"),
                   F.col("p2").alias("p2"))).alias("w"))
               .select(F.lit(step).cast("long").alias("step"),
                       F.col("w.p1").alias("p1"),
                       F.col("w.p2").alias("p2"),
                       (-F.col("w.neg")).cast("long").alias("pair_count")))
        steps.append(top)
        cur = (cur.crossJoin(F.broadcast(top.select("p1", "p2")))
               .select(F.replace(
                   F.col("sp"),
                   F.concat(F.lit(" "), F.col("p1"), F.lit(" "),
                            F.col("p2"), F.lit(" ")),
                   F.concat(F.lit(" "), F.col("p1"), F.col("p2"),
                            F.lit(" "))).alias("sp"), "f"))
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def _d30_sql() -> str:
    parts = ["""
WITH wf0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp, f
  FROM (SELECT w, COUNT(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2 GROUP BY w)
)"""]
    for i in range(1, _BPE_STEPS + 1):
        parts.append(f""",
pc{i} AS (
  SELECT t.sy[i] AS p1, t.sy[i + 1] AS p2,
         CAST(SUM(f) AS BIGINT) AS pair_count
  FROM (SELECT string_split(trim(sp), ' ') AS sy, f FROM wf{i - 1}) t,
       LATERAL (SELECT unnest(generate_series(1, len(t.sy) - 1)) AS i)
  WHERE len(t.sy) >= 2
  GROUP BY 1, 2
),
t{i} AS (
  SELECT CAST({i} AS BIGINT) AS step, p1, p2, pair_count FROM pc{i}
  ORDER BY pair_count DESC, p1, p2 LIMIT 1
),
wf{i} AS (
  SELECT replace(sp,
                 ' ' || (SELECT p1 FROM t{i}) || ' '
                     || (SELECT p2 FROM t{i}) || ' ',
                 ' ' || (SELECT p1 FROM t{i})
                     || (SELECT p2 FROM t{i}) || ' ') AS sp, f
  FROM wf{i - 1}
)""")
    union = " UNION ALL ".join(f"SELECT * FROM t{i}"
                               for i in range(1, _BPE_STEPS + 1))
    parts.append(f"\n{union}")
    return "".join(parts)


D30_SQL = _d30_sql()

# ---------------------------------------------------------------- q44

_BLOOM_M = 8192  # bits; k=2 hash functions (the two md5 halves)


def q44_bloom_prune_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Runtime Bloom-filter pruning over the orders→customer key flow:
    build a k=2, m=8192-bit filter from the DISTINCT order custkeys, probe
    every customer, report per-segment (probed, passed, true members,
    false positives).

    This is the mechanism behind runtime row-group skipping at 100 TB: the
    build side reduces to a bit set (here ≤2·|keys| positions, broadcast as
    a tiny frame), the probe side never shuffles — membership is two
    broadcast-hash-join lookups. The false-positive column is the leak rate
    a planner trades against scan savings; at sf0.1 the same m saturates —
    the sizing lesson is visible in the output, not just claimed.

    Exactness: bit positions are md5 halves mod m (portable), counts are
    integers; the oracle rebuilds the identical filter.
    """
    from etl_docker_spark.llm.dedup import _hash64_halves

    ok = (t(spark, sf, "orders").select("o_custkey").distinct())
    h0, h1 = _hash64_halves(F.col("o_custkey").cast("string"))
    pos = (ok.select((h0 % _BLOOM_M).alias("p"))
           .unionAll(ok.select((h1 % _BLOOM_M).alias("p")))
           .distinct())
    bits1 = pos.select(F.col("p").alias("p1"), F.lit(1).alias("hit1"))
    bits2 = pos.select(F.col("p").alias("p2"), F.lit(1).alias("hit2"))
    member = ok.select(F.col("o_custkey").alias("c_custkey"),
                       F.lit(1).alias("mem"))

    cust = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    ch0, ch1 = _hash64_halves(F.col("c_custkey").cast("string"))
    probed = (cust.select("c_custkey", "c_mktsegment",
                          (ch0 % _BLOOM_M).alias("p1"),
                          (ch1 % _BLOOM_M).alias("p2"))
              .join(F.broadcast(bits1), "p1", "left")
              .join(F.broadcast(bits2), "p2", "left")
              .join(F.broadcast(member), "c_custkey", "left")
              .withColumn("pass",
                          (F.col("hit1").isNotNull()
                           & F.col("hit2").isNotNull()).cast("int")))
    return (probed.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_probed"),
                 F.sum("pass").cast("long").alias("n_passed"),
                 F.sum(F.coalesce("mem", F.lit(0))).cast("long")
                 .alias("n_members"),
                 F.sum(F.when((F.col("pass") == 1) & F.col("mem").isNull(),
                              1).otherwise(0)).cast("long")
                 .alias("n_false_pos")))


Q44_SQL = f"""
WITH ok AS (SELECT DISTINCT o_custkey FROM orders),
pos AS (
  SELECT DISTINCT p FROM (
    SELECT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                AS BIGINT) % {_BLOOM_M} AS p FROM ok
    UNION ALL
    SELECT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 9, 8)
                AS BIGINT) % {_BLOOM_M} AS p FROM ok)
),
probed AS (
  SELECT c.c_mktsegment,
         CASE WHEN b1.p IS NOT NULL AND b2.p IS NOT NULL THEN 1 ELSE 0 END
             AS pass,
         CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS mem
  FROM customer c
  LEFT JOIN pos b1
    ON b1.p = CAST('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 8)
                   AS BIGINT) % {_BLOOM_M}
  LEFT JOIN pos b2
    ON b2.p = CAST('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)), 9, 8)
                   AS BIGINT) % {_BLOOM_M}
  LEFT JOIN ok m ON m.o_custkey = c.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_probed,
       CAST(SUM(pass) AS BIGINT) AS n_passed,
       CAST(SUM(mem) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN pass = 1 AND mem = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
FROM probed GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------- s09


def s09_stream_hll_users(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming HLL: distinct-user estimate per event type, maintained
    INCREMENTALLY through the streaming engine — the register table
    (event_type, bucket, max rho) is a streaming groupBy-MAX whose state is
    exactly the 64-number sketch, so arbitrary stream length accumulates
    into bounded state (the reason HLL is the streaming cardinality tool).
    The estimate is assembled from the final register table in batch; the
    oracle computes the identical deterministic sketch over the batch
    events view — equality proves the incremental register maintenance
    exactly reproduces the batch sketch (d28's mergeability, now across
    micro-batches instead of partitions).
    """
    from etl_docker_spark.plans._util import stream_state_partitions
    from etl_docker_spark.plans.advanced import (_events_stream,
                                                 _state_partitions_for)

    stream = _events_stream(spark, sf)
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")
                                 .cast("binary")), 1, 15), 16, 10) \
        .cast("long")
    keyed = stream.select("event_type", h.alias("hv")).select(
        "event_type", (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("wv"))
    rho = (F.when(F.col("wv") == 0, F.lit(_HLL_RHO_MAX))
           .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(F.col("wv")))))
    regs = (keyed.select("event_type", "bucket", rho.alias("rho"))
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("m_rho")))
    name = f"s09_sink_{abs(hash(sf)) % 10 ** 8}"
    with stream_state_partitions(spark, _state_partitions_for(spark, sf)):
        q = (regs.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()
    # empty registers contribute 2^RHO_MAX each, so the fill is arithmetic
    # (M - observed) — no bucket-completion join needed
    z = (spark.table(name).groupBy("event_type")
         .agg((F.expr(f"sum(shiftleft(cast(1 as bigint),"
                      f" {_HLL_RHO_MAX} - m_rho))")
               + (F.lit(_HLL_M) - F.count("*"))
               * F.lit(1 << _HLL_RHO_MAX).cast("long")).alias("z")))
    return z.select(
        "event_type",
        F.floor(F.lit(float(_HLL_ALPHA_NUM)) / F.col("z")).cast("long")
        .alias("hll_users"))


S09_SQL = f"""
WITH hashed AS (
  SELECT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) % {_HLL_M} AS bucket,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) // {_HLL_M} AS wv
  FROM events
),
r AS (
  SELECT event_type, bucket,
         CASE WHEN wv = 0 THEN {_HLL_RHO_MAX}
              ELSE {_HLL_RHO_MAX} - length(bin(wv)) END AS rho
  FROM hashed
),
reg AS (
  SELECT event_type, bucket, MAX(rho) AS m_rho
  FROM r GROUP BY event_type, bucket
),
s AS (
  SELECT event_type,
         SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_MAX} - m_rho))
           + ({_HLL_M} - COUNT(*))
             * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX}) AS z
  FROM reg GROUP BY event_type
)
SELECT event_type,
       CAST(FLOOR({_HLL_ALPHA_NUM} / z) AS BIGINT) AS hll_users
FROM s
"""

# ---------------------------------------------------------------- e11


def e11_ivfpq_search(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ (IVFADC) top-k search — the full production ANN index shape
    (Jegou et al.): route each query to its TRAINED coarse cell (e05's
    k-means), then score only that cell's vectors by PQ code lookup (e10's
    asymmetric distance), never touching raw candidate vectors.

    This composes the two halves the surface already proves separately:
    e06 routes but scores exact vectors; e10 scores codes but scans the
    whole corpus. Here the per-query work is |cell| code lookups — at 100 TB
    that is the difference between a RAM-resident index and an impossible
    scan. Plan shape: coarse assignments and the 4 codebooks come from
    single training passes (localCheckpoint'ed); queries ride broadcast
    frames (cell routes: 8 rows; distance tables: 32 rows each); the
    corpus-side work is one scan of the 4-byte code frame with broadcast
    hash joins. Exactness: every distance inherits e05/e09's integer-
    quantized, fold-ordered discipline, so the oracle pins distances
    bit-for-bit; ties break by neighbor id.
    """
    from etl_docker_spark.plans.round2 import e05_assignments
    from etl_docker_spark.plans.round2g import (_ADC_K, _ADC_NQ, _PQ_SUBS,
                                                _pq_base, _pq_dbl_dist,
                                                _pq_trained)

    assign = e05_assignments(spark, sf)
    base = _pq_base(spark, sf)
    codes_all = None
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
        codes_all = codes if codes_all is None else codes_all.join(codes,
                                                                   "vec_id")
    qa = (assign.filter(F.col("vec_id") < _ADC_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("cluster").alias("qcell")))
    cand = (codes_all.join(assign, "vec_id")
            .join(F.broadcast(qa), F.col("cluster") == F.col("qcell"))
            .filter(F.col("vec_id") != F.col("query_id")))
    scored = cand
    for s, dt in enumerate(dts):
        scored = scored.join(F.broadcast(dt), ["query_id", f"code{s}"])
    wq = Window.partitionBy("query_id")
    return (scored
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    (F.col("d0") + F.col("d1") + F.col("d2")
                     + F.col("d3")).alias("adc"))
            .withColumn("rank", F.row_number().over(
                wq.orderBy(F.asc("adc"), F.asc("neighbor_id"))).cast("long"))
            .filter(F.col("rank") <= _ADC_K)
            .select("query_id", "neighbor_id",
                    F.col("adc").alias("adc_dist"), "rank"))


def ivfpq_common_sql() -> str:
    """The WITH-prefix shared by e11/e12: e05's coarse training through
    `assign`, the 4 PQ subspace codebooks and codes, per-query distance
    tables, and the routed `adc_top` result (e11's output shape)."""
    from etl_docker_spark.plans.round2 import E05_SQL
    from etl_docker_spark.plans.round2g import (_ADC_K, _ADC_NQ, _PQ_SUBS,
                                                _adc_dt_sql, _pq_sub_sql)

    e05_body = E05_SQL.strip().removeprefix("WITH")
    e05_head = e05_body.rsplit("SELECT vec_id, cluster FROM d2", 1)[0].strip()
    return (
        f"WITH {e05_head},\n"
        "assign AS (\n"
        "  SELECT vec_id, cluster FROM d2\n"
        "  QUALIFY row_number() OVER (PARTITION BY vec_id"
        " ORDER BY dist, cluster) = 1\n"
        "),"
        + ",".join(_pq_sub_sql(s) for s in range(_PQ_SUBS))
        + "," + ",".join(_adc_dt_sql(s) for s in range(_PQ_SUBS))
        + f""",
codes AS (
  SELECT vec_id, code0, code1, code2, code3
  FROM code_0 JOIN code_1 USING (vec_id)
  JOIN code_2 USING (vec_id) JOIN code_3 USING (vec_id)
),
qa AS (
  SELECT vec_id AS query_id, cluster AS qcell FROM assign
  WHERE vec_id < {_ADC_NQ}
),
adc_scored AS (
  SELECT qa.query_id, c.vec_id AS neighbor_id,
         d0.d + d1.d + d2.d + d3.d AS adc
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN qa ON a.cluster = qa.qcell AND c.vec_id <> qa.query_id
  JOIN dt_0 d0 ON d0.query_id = qa.query_id AND d0.code = c.code0
  JOIN dt_1 d1 ON d1.query_id = qa.query_id AND d1.code = c.code1
  JOIN dt_2 d2 ON d2.query_id = qa.query_id AND d2.code = c.code2
  JOIN dt_3 d3 ON d3.query_id = qa.query_id AND d3.code = c.code3
),
adc_top AS (
  SELECT query_id, neighbor_id, adc AS adc_dist,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc, neighbor_id) AS BIGINT)
             AS rank
  FROM adc_scored
  QUALIFY rank <= {_ADC_K}
)""")


def _e11_sql() -> str:
    return (ivfpq_common_sql()
            + "\nSELECT query_id, neighbor_id, adc_dist, rank FROM adc_top")


ROUND2H = {
    "d28_hll_sketch": (d28_hll_sketch, D28_SQL),
    "d29_dup_span_stats": (d29_dup_span_stats, D29_SQL),
    "d30_bpe_merge_steps": (d30_bpe_merge_steps, D30_SQL),
    "q44_bloom_prune_stats": (q44_bloom_prune_stats, Q44_SQL),
    "e11_ivfpq_search": (e11_ivfpq_search, _e11_sql()),
    "s09_stream_hll_users": (s09_stream_hll_users, S09_SQL),
}
