"""Similarity search over embedding columns (array<float>).

- `brute_force_knn`: exact top-k by cosine — the correctness baseline. The
  query side is broadcast (queries are small by construction); candidates
  stream through a single narrow projection, so the cost is one pass over
  the corpus per batch of queries, no shuffle of the corpus itself.
- `bucketed_near_dup_pairs`: IVF-style coarse quantization — floor-bucket a
  few leading dimensions, self-join within buckets. Trades recall for a
  candidate set that scales with bucket occupancy instead of N^2. At real
  scale the bucketer would be a trained coarse quantizer; the floor-grid
  keeps it deterministic and oracle-checkable.

Dot products fold left-to-right in DOUBLE (`zip_with` + `aggregate`) so the
result is bit-identical to any engine that folds the same way — which makes
cosine scores themselves hashable by the correctness harness, not just ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow scan (e.g. one parquet file in testdata) to the
    cluster's parallelism.

    No-op when the input is already at least that wide: at 100 TB the scan
    is parallel on arrival and an unconditional repartition would be a full
    exchange of corpus vectors for nothing.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2_expr(a: Column) -> Column:
    return dot_expr(a, a)


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / F.sqrt(norm2_expr(a) * norm2_expr(b))


# MEASURED, do not "optimize": unrolling these folds into a 64-term
# `a[1]*b[1] + ... + a[64]*b[64]` chain to get them inside whole-stage
# codegen was tried and is ~6x SLOWER on the pair-verify joins (e02 12s ->
# 77s, e07 6s -> 39s at a 20k-vector corpus): the ~400-node expression
# tree blows the codegen budget for the join stage, the whole stage falls
# back to interpreted per-node eval, and the HOF evaluator's tight array
# loop wins decisively. Keep the zip_with/aggregate fold; keep pair counts
# bounded by candidate generation instead.


def brute_force_knn(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor id so results are total-ordered and reproducible.
    """
    # norms are folded ONCE per row before the join — the pair loop then does
    # a single dot product instead of three; a narrow scan fans out so the
    # dot-product work parallelizes even from a single-file input
    corpus = fan_out(corpus)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       norm2_expr(F.col(vec_col)).alias("qn2"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      norm2_expr(F.col(vec_col)).alias("cn2"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (dot_expr(F.col("qv"), F.col("cv"))
             / F.sqrt(F.col("qn2") * F.col("cn2"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 8).alias("cosine"), "rank")
    )


def bucket_expr(vec: Column, dim: int, scale: float = 4.0) -> Column:
    """Coarse-quantization bucket for 1-based dimension `dim`: floor(v*scale).

    floor (not round) — no round-half tie semantics to disagree on.
    """
    return F.floor(F.element_at(vec, dim).cast("double") * scale).cast("long")


def probe_cells(b1: Column, b2: Column, probes: int) -> Column:
    """All grid cells within `probes` steps of (b1, b2), as struct array.

    Multi-probe stays an EQUI-join: instead of a range predicate on bucket
    indices (which would degrade to a nested-loop join), the query side
    explodes into its (2*probes+1)^2 candidate cells and joins on exact
    cell identity — the standard scalable IVF multi-probe formulation.
    """
    offsets = range(-probes, probes + 1)
    return F.array(*[
        F.struct((b1 + F.lit(i)).alias("b1"), (b2 + F.lit(j)).alias("b2"))
        for i in offsets for j in offsets
    ])


def bucketed_knn(corpus: DataFrame, queries: DataFrame, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dims: tuple[int, int] = (1, 2), scale: float = 4.0,
                 probes: int = 0) -> DataFrame:
    """IVF-style approximate top-k: candidates share one of the query's
    probed coarse cells; exact cosine ranks within candidates.

    The scale path for ANN: cost tracks bucket occupancy x probe count,
    not corpus size. probes=0 searches only the query's own cell;
    probes=1 its 3x3 neighborhood, etc. — the recall/cost dial
    (e03/e04 measure it). The floor-grid keeps every variant
    deterministic and oracle-checkable.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm2_expr(F.col(vec_col)).alias("cn2"),
        bucket_expr(F.col(vec_col), dims[0], scale).alias("b1"),
        bucket_expr(F.col(vec_col), dims[1], scale).alias("b2"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm2_expr(F.col(vec_col)).alias("qn2"),
        bucket_expr(F.col(vec_col), dims[0], scale).alias("b1"),
        bucket_expr(F.col(vec_col), dims[1], scale).alias("b2"),
    )
    if probes:
        q = (q.select("query_id", "qv", "qn2",
                      F.explode(probe_cells(F.col("b1"), F.col("b2"),
                                            probes)).alias("cell"))
             .select("query_id", "qv", "qn2",
                     F.col("cell.b1").alias("b1"), F.col("cell.b2").alias("b2")))
    scored = (
        c.join(F.broadcast(q), ["b1", "b2"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (dot_expr(F.col("qv"), F.col("cv"))
                 / F.sqrt(F.col("qn2") * F.col("cn2"))).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.round("cosine", 8).alias("cosine"), "rank"))


def bucketed_near_dup_pairs(corpus: DataFrame, threshold: float,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            dims: tuple[int, int] = (1, 2), scale: float = 4.0,
                            cell_cap: int | None = None,
                            refine_dims: tuple[int, ...] = (3, 4, 5, 6)) -> DataFrame:
    """IVF-bucketed near-duplicate pairs with cosine >= threshold.

    Pairs are only compared within the same coarse bucket (recall<1 by
    design — the documented ANN trade). Output: (id_a, id_b, cosine).

    Skew hardening: the within-cell self-join is quadratic in cell
    occupancy, so a natural corpus with a hot cell (many vectors sharing
    the two leading coarse buckets) would blow up. With `cell_cap` set,
    cells holding more than `cell_cap` rows are refined by bucketing one
    more dimension from `refine_dims` at a time until every effective cell
    is under the cap (or dims run out). Cold cells keep the exact 2-dim
    semantics — a corpus with no hot cell returns bit-identical results
    with or without the cap. Hotness is decided from ONE narrow rollup
    aggregation (id/bucket tuples only, map-side combined) and applied with
    broadcast joins, so the corpus itself is never shuffled for it; the
    pair join shuffles once on the effective cell key. After full
    refinement any still-hot cell holds vectors agreeing in
    2+len(refine_dims) leading buckets — near-identical vectors whose pair
    OUTPUT is itself quadratic, i.e. the residual cost is proportional to
    the answer, not to an artifact of coarse bucketing.
    """
    corpus = fan_out(corpus)
    base_cols = [
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm2_expr(F.col(vec_col)).alias("n2"),
        bucket_expr(F.col(vec_col), dims[0], scale).alias("b1"),
        bucket_expr(F.col(vec_col), dims[1], scale).alias("b2"),
    ]
    if cell_cap is None:
        e = corpus.select(*base_cols).withColumn(
            "cell", F.array(F.col("b1"), F.col("b2")))
    else:
        e = _refined_cells(corpus.select(
            *base_cols,
            *[bucket_expr(F.col(vec_col), d, scale).alias(f"c{i + 1}")
              for i, d in enumerate(refine_dims)],
        ), cell_cap, len(refine_dims))
    # both sides of the self-join consume e; without pinning, the whole
    # norms+bucketing(+refinement) pipeline runs twice — ~20% of query wall
    # at ~sf1. On a cluster this is a persist(DISK_ONLY)-sized decision;
    # localCheckpoint keeps it deterministic here.
    e = e.localCheckpoint()
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.cell") == F.col("b.cell"),
                      F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            (dot_expr(F.col("a.v"), F.col("b.v"))
             / F.sqrt(F.col("a.n2") * F.col("b.n2"))).alias("cosine"),
        )
    )
    return (
        pairs.filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 8).alias("cosine"))
    )


def hyperplane_signatures(corpus: DataFrame,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          planes: int = 32,
                          quant: int = 1024) -> DataFrame:
    """The trainable half of sign-bit LSH: (id, sig) signature table.

    Deterministic (md5-derived weights, integer whitening stats), so it is
    a persistable index artifact — e07 memoizes it via index_cache and a
    fresh session serves it from parquet instead of re-projecting the
    corpus (the projection is ~60% of e07's wall time at ~sf1).
    """
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < target:
        corpus = corpus.repartition(target, F.col(id_col))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # OFFSET keeps every quantized component positive (|v| < 1024 assumed),
    # so corpus sums stay positive and integer division is engine-portable;
    # centering cancels the offset exactly
    offset = 1 << 20
    comps = c.select(
        "id", F.posexplode("v").alias("pos", "val"),
    ).select("id", (F.col("pos") + 1).alias("d"),
             (F.floor(F.col("val").cast("double") * quant).cast("long")
              + offset).alias("qd"))

    def w_expr(p: int):
        # int16 from md5("hp_<p>_<d>")
        return (F.conv(F.substring(F.md5(F.concat_ws(
            "", F.lit(f"hp_{p}_"), F.col("d").cast("string")).cast("binary")),
            1, 4), 16, 10).cast("long") - 32768).alias(f"w{p}")

    # one row per dimension: whitening stats + all plane weights as columns
    # (a (plane, dim) row grid would multiply the corpus-width intermediate
    # by `planes`) — derived in-engine so any executor count gets identical
    # constants
    stats = (comps.groupBy("d")
             .agg(F.expr("sum(qd) div count(*)").alias("mu"),
                  F.max("qd").alias("mx"), F.min("qd").alias("mn"))
             .select("d", "mu",
                     F.expr(f"{1 << 20} div greatest(mx - mu, mu - mn, 1L)")
                     .alias("m"),
                     *[w_expr(p) for p in range(planes)]))
    proj = (comps.join(F.broadcast(stats), "d")
            .groupBy("id")
            .agg(*[F.sum(F.col(f"w{p}")
                         * ((F.col("qd") - F.col("mu")) * F.col("m")))
                   .alias(f"s{p}") for p in range(planes)]))
    word = None
    for p in range(planes):
        term = (F.when(F.col(f"s{p}") >= 0, F.lit(1 << p).cast("long"))
                .otherwise(F.lit(0).cast("long")))
        word = term if word is None else word + term
    return proj.select("id", word.alias("sig"))


def hyperplane_lsh_pairs(corpus: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         planes: int = 32, band_bits: int = 8,
                         quant: int = 1024, dims: int = 64,
                         signatures: DataFrame | None = None) -> DataFrame:
    """Random-hyperplane (sign-bit) LSH near-duplicate pairs.

    The classic cosine-LSH alternative to IVF grid bucketing (e02): each of
    `planes` pseudo-random hyperplanes contributes one sign bit
    sign(<w_p, v>); vectors agreeing on ALL bits of any band of `band_bits`
    consecutive bits become candidates, verified by exact cosine. Collision
    probability per bit is 1 - theta/pi; a band admits an UNRELATED pair
    (theta ~ pi/2) with probability ~2^-band_bits, so band width is the
    candidate-volume dial: at the 4-bit default this operator first shipped
    with, ~1/16 of ALL pairs collide per band — an all-pairs pass in
    disguise that a 10x corpus run exposed (one task grinding a ~300M-pair
    verify). 8-bit bands admit ~0.4% of random pairs per band, restoring
    candidate volume ~linear in corpus size at a recall cost on
    moderate-similarity pairs that is the documented LSH trade (recall < 1
    by design; e03/e04 measure the analogous IVF dial).

    Sign bits are only informative on CENTERED, comparably-scaled data:
    this corpus has one dominant dimension (a cluster coordinate, range
    ~0..72 vs ~±0.45 everywhere else) and a non-zero mean, under which raw
    sign(<w, v>) collapses — 70-90%% of all vectors landed in ONE band key
    (measured: 535M candidate pairs at a 20k corpus). The projection
    therefore diagonally whitens first (see hyperplane_signatures, where
    the projection lives): per-dimension integer center mu_d and scale
    multiplier m_d, both exact BIGINT aggregates, then z_d = (qd - mu_d) *
    m_d — all engine-portable integer arithmetic.

    `signatures` injects a pre-pinned signature table (the index_cache
    artifact tier); when None the projection runs inline and is
    localCheckpoint'ed so the band self-join doesn't compute it twice.
    The only corpus-width shuffles are the band self-join and the two
    verify joins, all narrow equi-joins.
    """
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < target:
        corpus = corpus.repartition(target, F.col(id_col))
    bands = planes // band_bits
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                      norm2_expr(F.col(vec_col)).alias("n2"))
    if signatures is None:
        # pinned: the band self-join consumes both sides of it
        sig = hyperplane_signatures(corpus, id_col, vec_col, planes,
                                    quant).localCheckpoint()
    else:
        sig = signatures  # pre-pinned artifact (memo/disk tier)
    bt = (sig.select(
            "id", "sig",
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx"))
          .select("id",
                  F.col("band_idx"),
                  F.expr(f"shiftright(sig, band_idx * {band_bits}) "
                         f"& {(1 << band_bits) - 1}").alias("key")))
    cand = (bt.alias("a").join(bt.alias("b"),
                               on=[F.col("a.band_idx") == F.col("b.band_idx"),
                                   F.col("a.key") == F.col("b.key"),
                                   F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    va = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                  F.col("n2").alias("na"))
    vb = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                  F.col("n2").alias("nb"))
    scored = (cand.join(va, "id_a").join(vb, "id_b")
              .select("id_a", "id_b",
                      (dot_expr(F.col("va"), F.col("vb"))
                       / F.sqrt(F.col("na") * F.col("nb"))).alias("cos_raw")))
    return (scored.filter(F.col("cos_raw") >= threshold)
            .select("id_a", "id_b", F.round("cos_raw", 8).alias("cosine")))


def _refined_cells(keyed: DataFrame, cell_cap: int, n_refine: int) -> DataFrame:
    """Attach the skew-adaptive `cell` key: [b1, b2] extended one refinement
    bucket at a time while the prefix cell is hot (> cell_cap rows).

    All prefix-level occupancies come from ONE rollup pass over narrow
    bucket tuples; level membership is read off grouping_id (no ambiguity
    with NULL bucket values). Hot-cell sets are tiny (cells, not rows) and
    broadcast, so the corpus is never shuffled to decide depth. Every row
    of a given prefix cell sees the same occupancies, so two rows land in
    the same effective cell iff refinement never separated them — the
    within-cell pair semantics need no cross-level patching.
    """
    key_cols = ["b1", "b2"] + [f"c{i + 1}" for i in range(n_refine)]
    occ = (keyed.rollup(*key_cols)
           .agg(F.count("*").alias("occ"), F.grouping_id().alias("gid")))
    out = keyed
    depth = None
    for level in range(n_refine):
        # grouping_id bit i set <=> key_cols[i] aggregated away; level L
        # keeps the first 2+L columns -> gid == 2^(n_refine-L) - 1
        gid = (1 << (n_refine - level)) - 1
        prefix = key_cols[: 2 + level]
        hot = (occ.filter((F.col("gid") == gid) & (F.col("occ") > cell_cap))
               .select(*prefix, F.lit(True).alias(f"h{level}")))
        out = out.join(F.broadcast(hot), on=prefix, how="left")
        is_cold = F.col(f"h{level}").isNull()
        depth = (F.when(is_cold, level) if depth is None
                 else depth.when(is_cold, level))
    depth = depth.otherwise(n_refine)
    return out.withColumn(
        "cell",
        F.slice(F.array(*[F.col(c) for c in key_cols]), 1, depth + F.lit(2)),
    ).drop(*[f"h{lv}" for lv in range(n_refine)])
