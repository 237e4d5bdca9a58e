"""Round-5 queries.

Opens with the suffix filter (d53) — the third exactness-preserving
candidate shrinker in the AllPairs/PPJoin family (d47 prefix, d49
positional), closing the PPJoin+ set of Xiao et al. WWW'08.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (round-5 queries)

from etl_docker_spark.plans._util import dec, session_conf, t  # noqa: F401

ROUND5: dict = {}

# ---------------------------------------------------------------- d53


def d53_suffix_filter_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.7 pairs with the FULL PPJoin+ filter
    stack: prefix + positional + suffix filtering — d49's documented
    next shrinker, for adversarial corpora where prefix collisions
    survive the positional bound (near-identical sizes, early first
    match) yet can't verify. Zero false negatives: the suffix filter
    only removes candidates whose K-bucket histogram overlap bound
    sum_k min(histA[k], histB[k]) is below the Jaccard minoverlap, so
    the output is identical to d49's (and to the brute-force oracle)
    by construction — the gate pins exactly that.

    See `llm/dedup.py:prefix_filter_jaccard_pairs(suffix_buckets=32)`
    for the distributed re-shape of Xiao's sequential divide-and-conquer
    probe (a 256-byte histogram sketch per doc replaces the recursive
    partitioning; the bound is coarser per-probe but order-free,
    joinable, and computed once per candidate). Measured at sf0.1:
    104,475 prefix candidates -> 33,316 after positional -> 257 after
    suffix (K=32) for 256 true pairs — 99.6% filter precision, with
    the full table in SCALE.md.
    """
    from etl_docker_spark.llm.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3,
        t_num=7, t_den=10, positional=True, suffix_buckets=32)


from etl_docker_spark.plans.round4c import D49_SQL  # noqa: E402

# Identical ground truth: the filter stack only prunes non-qualifying
# candidates, so the brute-force all-pairs oracle is shared with d49.
D53_SQL = D49_SQL

ROUND5.update({
    "d53_suffix_filter_jaccard": (d53_suffix_filter_jaccard, D53_SQL),
})

# ---------------------------------------------------------------- g06


def g06_cc_largestar(spark: SparkSession, sf: str) -> DataFrame:
    """Full dedup-cluster labeling of the exact-Jaccard pair graph by
    large-star/small-star alternation (Kiveris et al. SoCC'14) — the
    connected-components formulation for graphs whose DIAMETER or skew
    defeats label propagation: each round is two edge-list rewrites
    bounded by |E| shuffle volume, edges migrate toward the component
    minimum (the graph itself contracts), and convergence is O(log^2 n)
    rounds regardless of diameter. The pointer-jumping CC
    (operators/graph.py:connected_components, used by d08/d48) stays
    the cheap choice for shallow dup clusters; this is the one that
    survives a 100 TB web-crawl graph with million-node chains.
    Identical output contract to the other CC — the gate pins the full
    (doc_id, cluster_id) labeling against the oracle's transitive
    closure, and tests pin cross-algorithm equality on random graphs.

    Consumes the session-memoized d47 pair frame (the shingle pass and
    prefix join are paid once across d47/d48/g06)."""
    from etl_docker_spark.operators.graph import (
        connected_components_two_phase)
    from etl_docker_spark.plans.round4b import prefix_jaccard_pairs_frame

    return (connected_components_two_phase(
        prefix_jaccard_pairs_frame(spark, sf),
        src="doc_a", dst="doc_b")
        .select(F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_id")))


from etl_docker_spark.plans.round4b import _D47_HASHED_CTES  # noqa: E402

G06_SQL = f"""
WITH RECURSIVE {_D47_HASHED_CTES},
hs AS (SELECT doc_id, list_distinct(hh) AS hs FROM hashed),
tokx AS (SELECT doc_id, unnest(hs) AS h FROM hs),
pre AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_n
  FROM tokx a JOIN tokx b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM pre p
  JOIN hs sa ON sa.doc_id = p.doc_a
  JOIN hs sb ON sb.doc_id = p.doc_b
  WHERE 2 * p.inter_n >= len(sa.hs) + len(sb.hs) - p.inter_n
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.other = e.a
)
SELECT node AS doc_id, LEAST(node, MIN(other)) AS cluster_id
FROM reach GROUP BY node
"""

ROUND5.update({
    "g06_cc_largestar": (g06_cc_largestar, G06_SQL),
})

# ---------------------------------------------------------------- q87


def q87_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """Engine-native RECURSIVE CTE (new in Spark 4.x): unbounded
    ancestor rollup over the implicit decimal hierarchy parent(k) =
    k div 10 — every customer's balance (integer cents) propagates to
    ALL its ancestors, recursion depth set by the data (number of key
    digits), not by a hardcoded bound. The deliberate contrast is g05,
    which rolls up the SAME hierarchy by enumerating <= 7 ancestor
    prefixes with explode: enumeration is the right 100 TB plan when
    depth is known (one map-side pass, map-combinable agg, no
    iteration barriers); recursion is the tool when it isn't. Each
    recursion level here is one narrow (node, ancestor, cents) frame —
    the UNION ALL accumulates |customers| * depth rows, so the
    recursion-row limit is raised for the session (it defaults to 1M
    rows, which ~sf1's 150k customers * 7 levels trips).

    Output: one row per hierarchy node that has strict descendants —
    descendant count and their total balance in cents."""
    t(spark, sf, "customer").createOrReplaceTempView("q87_customer")
    # The limit is consulted at EXECUTION time and the returned frame is
    # lazy, so a scoped set-then-restore would revert before the action
    # runs (found at ~sf1: 150k customers x 7 levels tripped the
    # restored 1M default). Session-level raise, no restore — the limit
    # is a runaway-recursion backstop and 50M keeps that role.
    session_conf(spark, "spark.sql.cteRecursionRowLimit", str(50_000_000))
    return spark.sql("""
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey div 10 AS ancestor,
         CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT)
           AS bal_cents
  FROM q87_customer
  UNION ALL
  SELECT node, ancestor div 10, bal_cents FROM anc WHERE ancestor > 0
)
SELECT ancestor, CAST(COUNT(*) AS BIGINT) AS n_desc,
       CAST(SUM(bal_cents) AS BIGINT) AS desc_bal_cents
FROM anc WHERE ancestor > 0
GROUP BY ancestor
""")


Q87_SQL = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey // 10 AS ancestor,
         CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 100 AS BIGINT)
           AS bal_cents
  FROM customer
  UNION ALL
  SELECT node, ancestor // 10, bal_cents FROM anc WHERE ancestor > 0
)
SELECT ancestor, CAST(COUNT(*) AS BIGINT) AS n_desc,
       CAST(SUM(bal_cents) AS BIGINT) AS desc_bal_cents
FROM anc WHERE ancestor > 0
GROUP BY ancestor
"""

ROUND5.update({
    "q87_recursive_cte": (q87_recursive_cte, Q87_SQL),
})

# ---------------------------------------------------------------- d54

_D54_STEPS = 3  # same horizon as d30 — the merges d54 applies are d30's


def d54_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """BPE ENCODING — applying d30's learned merge table to the corpus,
    the other half of the tokenizer lifecycle (d27/d30/d39 learn; this
    encodes). Per document: word count, encoded token count under the
    3-merge vocab, character mass, and tokens-per-char (ppm) — the
    compression statistic that decides whether a tokenizer is paying
    for itself before a training run.

    Scale shape — encode by word TYPE, never by occurrence: the merge
    replaces run over the distinct-word frame (orders of magnitude
    smaller than the token stream), and the per-occurrence cost is one
    (word -> symbol count) equi-join. The training chain is d30's loop
    verbatim (types with length >= 2, frequency-weighted winner per
    step); each step's winning pair broadcasts into a string replace on
    BOTH the training frame and the encoding frame. The corpus is
    scanned twice in total (once for types, once for per-doc counts) —
    at 100 TB the type table join is the whole cost, and it is a plain
    shuffle-hash join on the word."""
    docs = t(spark, sf, "documents")
    to_sp = F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 "))
    wf = (docs.select(F.explode(F.split("text", " ")).alias("w"))
          .filter(F.length("w") >= 2)
          .groupBy("w").agg(F.count("*").alias("f"))
          .select(to_sp.alias("sp"), "f")
          .localCheckpoint())
    wt = (docs.select(F.explode(F.split("text", " ")).alias("w"))
          .distinct()
          .select("w", to_sp.alias("sp"))
          .localCheckpoint())
    for step in range(1, _D54_STEPS + 1):
        syms = F.split(F.trim(F.col("sp")), " ")
        prs = (wf.filter(F.size(syms) >= 2)
               .select("f", F.explode(F.transform(
                   F.sequence(F.lit(1), F.size(syms) - 1),
                   lambda i: F.struct(
                       F.element_at(syms, i).alias("p1"),
                       F.element_at(syms, i + 1).alias("p2"))))
                   .alias("pr"))
               .select(F.col("pr.p1").alias("p1"),
                       F.col("pr.p2").alias("p2"), "f"))
        # top-1 as a ONE-ROW aggregate, not a global row_number window:
        # min(struct(-count, p1, p2)) is lexicographic (max count, then
        # min p1, min p2) — same winner, zero WindowExec nodes, so bench
        # and oracle logs stay free of "No Partition Defined" spam and a
        # FUTURE unpartitioned window in a log is a real alarm. (The old
        # filter(rn == 1) plan was provably bounded — Catalyst rewrote
        # it to TakeOrderedAndProject — but warned 6x per sweep step.)
        top = (prs.groupBy("p1", "p2").agg(F.sum("f").alias("pair_count"))
               .agg(F.min(F.struct(
                   (-F.col("pair_count")).alias("neg_count"),
                   F.col("p1").alias("p1"),
                   F.col("p2").alias("p2"))).alias("t"))
               .select(F.col("t.p1").alias("p1"),
                       F.col("t.p2").alias("p2")))

        def merged() -> Column:
            # Rewrites whatever frame the caller selects on: references
            # the post-crossJoin columns sp/p1/p2 by name only.
            return F.replace(
                F.col("sp"),
                F.concat(F.lit(" "), F.col("p1"), F.lit(" "),
                         F.col("p2"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("p1"), F.col("p2"),
                         F.lit(" "))).alias("sp")

        wf = (wf.crossJoin(F.broadcast(top)).select(merged(), "f"))
        wt = (wt.crossJoin(F.broadcast(top)).select("w", merged()))
    sym = wt.select(
        "w", F.size(F.split(F.trim(F.col("sp")), " "))
        .cast("long").alias("n_sym"))
    occ = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    return (occ.join(sym, "w")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("n_sym").cast("long").alias("n_tokens"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"))
            .select("doc_id", "n_words", "n_tokens", "n_chars",
                    F.expr("(1000000 * n_tokens)"
                           " div greatest(n_chars, 1)")
                    .alias("tok_per_char_ppm")))


def _d54_sql() -> str:
    parts = ["""
WITH wf0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp, f
  FROM (SELECT w, COUNT(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2 GROUP BY w)
),
wt0 AS (
  SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sp
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        FROM documents)
)"""]
    for i in range(1, _D54_STEPS + 1):
        parts.append(f""",
pc{i} AS (
  SELECT t.sy[i] AS p1, t.sy[i + 1] AS p2, SUM(f) AS pair_count
  FROM (SELECT string_split(trim(sp), ' ') AS sy, f FROM wf{i - 1}) t,
       LATERAL (SELECT unnest(generate_series(1, len(t.sy) - 1)) AS i)
  WHERE len(t.sy) >= 2
  GROUP BY 1, 2
),
t{i} AS (
  SELECT p1, p2 FROM pc{i} ORDER BY pair_count DESC, p1, p2 LIMIT 1
),
wf{i} AS (
  SELECT replace(sp,
                 ' ' || (SELECT p1 FROM t{i}) || ' '
                     || (SELECT p2 FROM t{i}) || ' ',
                 ' ' || (SELECT p1 FROM t{i})
                     || (SELECT p2 FROM t{i}) || ' ') AS sp, f
  FROM wf{i - 1}
),
wt{i} AS (
  SELECT w, replace(sp,
                    ' ' || (SELECT p1 FROM t{i}) || ' '
                        || (SELECT p2 FROM t{i}) || ' ',
                    ' ' || (SELECT p1 FROM t{i})
                        || (SELECT p2 FROM t{i}) || ' ') AS sp
  FROM wt{i - 1}
)""")
    parts.append(f""",
sym AS (
  SELECT w, CAST(len(string_split(trim(sp), ' ')) AS BIGINT) AS n_sym
  FROM wt{_D54_STEPS}
),
occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       CAST(SUM(length(w)) AS BIGINT) AS n_chars,
       CAST((1000000 * SUM(n_sym)) // greatest(SUM(length(w)), 1)
            AS BIGINT) AS tok_per_char_ppm
FROM occ JOIN sym USING (w)
GROUP BY doc_id""")
    return "".join(parts)


D54_SQL = _d54_sql()

ROUND5.update({
    "d54_bpe_encode": (d54_bpe_encode, D54_SQL),
})

# ---------------------------------------------------------------- s26

_S26_CUTOFF = "2024-01-11"


def s26_state_datasource(spark: SparkSession, sf: str) -> DataFrame:
    """STATE INTROSPECTION via the state data source (new in Spark 4):
    after an availableNow run of the day-windowed aggregate, read the
    checkpoint's state store back as a BATCH DataFrame
    (`spark.read.format("statestore")`) and gate its CONTENTS — the
    actual buffered (window, event_type) partial aggregates — not just
    the row count s21 pins from progress metrics. This is the
    operational surface that matters at 100 TB: inspecting or
    repairing a streaming job's state without replaying the stream
    (the offline half of state management; the online half is the
    job itself).

    Prediction (s21's pinned eviction semantics): after the final
    no-data batch, state holds exactly the OPEN windows — groups whose
    window end outlives the end-of-stream watermark (max ts - delay) —
    and since end-of-stream means every event has arrived, each open
    window's buffered partial aggregate equals the full batch count of
    its group. The state reader runs under the same provider conf as
    the write (RocksDB by default), exercising the provider round-trip.
    """
    import os
    import shutil
    import tempfile

    from etl_docker_spark.plans._util import (stage_day_files,
                                              stream_state_partitions)

    ev = (t(spark, sf, "events")
          .filter(F.col("ts") < F.lit(_S26_CUTOFF).cast("timestamp"))
          .select("ts", "event_type",
                  F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("dcol")))

    work = tempfile.mkdtemp(prefix="s26_")
    try:
        arrivals = stage_day_files(ev, work)
        probe = spark.read.parquet(arrivals)
        stream = (spark.readStream.schema(probe.schema)
                  .option("maxFilesPerTrigger", "1").parquet(arrivals))
        agg = (stream.withWatermark("ts", "1 minute")
               .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
               .agg(F.count("*").cast("long").alias("n_events")))
        ckpt = os.path.join(work, "ckpt")
        with stream_state_partitions(spark, 4):
            q = (agg.writeStream.outputMode("append").format("noop")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            # A timed-out availableNow run leaves PARTIAL aggregates in
            # the store — reading them as the answer would be silently
            # wrong, so a non-terminated run must raise, never proceed.
            finished = q.awaitTermination(300)
            q.stop()
            if not finished:
                raise RuntimeError(
                    "s26: availableNow run did not terminate within "
                    "300 s; refusing to read a partial state store")
            # Read under the SAME provider conf the write used — the
            # reader materializes the store files, not the progress API.
            state = (spark.read.format("statestore").load(ckpt)
                     .select(
                         F.col("key.window.start").alias("w_start"),
                         F.col("key.event_type").alias("event_type"),
                         # state schema keeps the physical aggregate
                         # name (`count`), not the query alias
                         F.col("value.count").cast("long")
                         .alias("n_events"))
                     .localCheckpoint())
        return state
    finally:
        shutil.rmtree(work, ignore_errors=True)


S26_SQL = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
         event_type, ts
  FROM events WHERE ts < TIMESTAMP '{_S26_CUTOFF} 00:00:00'
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM ev)
SELECT w_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM ev, wm
GROUP BY w_start, event_type, wm.w
HAVING w_start + INTERVAL 1 DAY > wm.w
"""

ROUND5.update({
    "s26_state_datasource": (s26_state_datasource, S26_SQL),
})

# ---------------------------------------------------------------- d55


def d55_self_dedup_curation(spark: SparkSession, sf: str) -> DataFrame:
    """Within-doc self-dedup CURATION — d52 sizes the worst internal
    repeat; this emits the curation arithmetic: how many tokens each
    document loses when every LATER copy of a repeated run is removed
    (the within-document half of Lee et al. '22's dedup policy, which
    keeps the first occurrence). Per doc: token count, duplicate mass,
    curated token count, and duplicate ppm — the columns a token-budget
    pass (d18) would consume.

    Exactness without streak reconstruction: a token position q is
    duplicate mass iff it lies inside the LATER copy of some repeated
    k-gram (pa < pb = pa + d, q in [pb, pb+k-1]) — the union of those
    per-gram intervals IS the union of the repeated-run later copies,
    because a run's later copy is exactly the union of its grams'
    [pb, pb+k-1] windows. |union| computes with one sorted lag per doc:
    sum of min(k, pb - prev_pb) over distinct duplicate gram positions
    (first contributes k). Window partitions are bounded by one doc's
    self-match volume, as in d52.

    Every document appears (zero-loss docs report dup_tokens = 0) —
    a curation table, not an offender list."""
    from pyspark.sql import Window

    from etl_docker_spark.llm.dedup import _base_hash

    k = 2  # d52's horizon: the synthetic corpus repeats are short
    df = t(spark, sf, "documents")
    df = df.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id"))
    toks = F.split(F.col("text"), " ")
    tok_rows = df.select(
        F.col("doc_id").alias("doc"), F.size(toks).alias("sz"),
        F.posexplode(toks).alias("pos", "tok"))
    w = Window.partitionBy("doc").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    grams = (tok_rows.select("doc", "sz", "pos",
                             F.concat_ws(" ", *leads).alias("s"))
             .filter(F.col("pos") <= F.col("sz") - k)
             .select("doc", F.col("pos").cast("long").alias("p"),
                     _base_hash(F.col("s")).alias("h")))
    dup_pos = (grams.alias("a").join(
        grams.alias("b"),
        (F.col("a.doc") == F.col("b.doc")) & (F.col("a.h") == F.col("b.h"))
        & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.doc").alias("doc"), F.col("b.p").alias("pb"))
        .distinct())
    w2 = Window.partitionBy("doc").orderBy("pb")
    cov = (dup_pos.withColumn("prev", F.lag("pb").over(w2))
           .select("doc", F.when(F.col("prev").isNull(), F.lit(k))
                   .otherwise(F.least(F.lit(k),
                                      F.col("pb") - F.col("prev")))
                   .alias("c"))
           .groupBy("doc").agg(F.sum("c").cast("long").alias("dup")))
    base = df.select(F.col("doc_id"),
                     F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens"))
    return (base.join(cov, base["doc_id"] == cov["doc"], "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("dup", F.lit(0)).cast("long")
                    .alias("dup_tokens"))
            .select("doc_id", "n_tokens", "dup_tokens",
                    (F.col("n_tokens") - F.col("dup_tokens"))
                    .alias("curated_tokens"),
                    F.expr("(1000000 * dup_tokens)"
                           " div greatest(n_tokens, 1)")
                    .alias("dup_ppm")))


D55_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
g AS (
  SELECT doc_id, i AS p,
         CAST('0x' || substring(
           md5(array_to_string(tk[i:i+1], ' ')), 1, 8) AS BIGINT) AS h
  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
dup AS (
  SELECT DISTINCT a.doc_id AS doc, b.p AS pb
  FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.h = b.h AND a.p < b.p
),
cov AS (
  SELECT doc,
         CAST(SUM(least(2, pb - coalesce(prev, pb - 2))) AS BIGINT)
           AS dup_tokens
  FROM (SELECT doc, pb,
               lag(pb) OVER (PARTITION BY doc ORDER BY pb) AS prev
        FROM dup)
  GROUP BY doc
)
SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
       coalesce(dup_tokens, 0) AS dup_tokens,
       CAST(len(tk) AS BIGINT) - coalesce(dup_tokens, 0)
         AS curated_tokens,
       CAST((1000000 * coalesce(dup_tokens, 0))
            // greatest(len(tk), 1) AS BIGINT) AS dup_ppm
FROM toks LEFT JOIN cov ON toks.doc_id = cov.doc
"""

ROUND5.update({
    "d55_self_dedup_curation": (d55_self_dedup_curation, D55_SQL),
})
