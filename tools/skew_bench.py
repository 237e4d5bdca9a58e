"""Skewed-corpus benchmark for the bucketed near-dup operator (SCALE.md).

The replica corpora used for the main scale runs shift embeddings into
disjoint buckets BY CONSTRUCTION, so they can't show the hot-cell failure
mode. This builds a deliberately skewed corpus — `hot_frac` of all vectors
share one (b1, b2) coarse cell, the rest spread — and measures
`bucketed_near_dup_pairs` with and without the cell_cap refinement. Without
the cap the hot cell is quadratic (n_hot^2/2 candidate pairs); with it the
cell refines on later dimensions until occupancy is bounded.

Usage: python tools/skew_bench.py [n_total] [hot_frac]
Prints one JSON line with wall seconds and pair counts for both modes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build(n_total: int, hot_frac: float, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n_hot = int(n_total * hot_frac)
    n_cold = n_total - n_hot

    # hot: dims 1-2 pinned inside bucket (0,0); dims 3-4 spread so the
    # refinement has something to split on; the tail is noise
    hot = np.empty((n_hot, 64), dtype=np.float32)
    hot[:, 0] = rng.uniform(0.01, 0.24, n_hot)
    hot[:, 1] = rng.uniform(0.01, 0.24, n_hot)
    hot[:, 2] = rng.uniform(0.0, 4.0, n_hot)      # 16 buckets at scale 4
    hot[:, 3] = rng.uniform(0.0, 8.0, n_hot)      # 32 buckets
    hot[:, 4:] = rng.normal(0.0, 1.0, (n_hot, 60)).astype(np.float32)

    cold = np.empty((n_cold, 64), dtype=np.float32)
    cold[:, 0] = rng.uniform(-3.0, 3.0, n_cold)
    cold[:, 1] = rng.uniform(-3.0, 3.0, n_cold)
    cold[:, 2:] = rng.normal(0.0, 1.0, (n_cold, 62)).astype(np.float32)

    mat = np.vstack([hot, cold])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_total, dtype=np.int64)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n_total, dtype=np.int32)),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def build_zipf_corpus(n_docs: int, hot_frac: float, path: str,
                      words_per_doc: int = 120, vocab: int = 50_000) -> None:
    """Natural-language-shaped corpus for the classifier-join stress
    (round-6 verdict item 6): token frequencies Zipfian, plus one
    engineered hot token carrying `hot_frac` of ALL feature mass — the
    worst case for a shuffle-by-bucket model join (d59/d60's explode+join
    shape when the weight table outgrows broadcast)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    # Zipf ranks (a=1.3 keeps the tail long enough to fill 4096 buckets)
    ranks = rng.zipf(1.3, size=(n_docs, words_per_doc)) % vocab
    hot = rng.random((n_docs, words_per_doc)) < hot_frac
    texts = []
    for i in range(n_docs):
        row = np.where(hot[i], -1, ranks[i])
        texts.append(" ".join(
            "tok_hot" if r < 0 else f"tok_{r}" for r in row))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "lang": pa.array(["xx"] * n_docs),
        "text": pa.array(texts),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def zipf_classifier_join(n_docs: int, hot_frac: float,
                         trained: bool = False) -> None:
    """Measure d59/d60's explode + model-join inference under Zipfian
    feature skew, across the three join shapes a growing model walks
    through: broadcast (default), shuffle join with AQE skew handling
    (the multi-GB-model shape), and shuffle join + salted replication
    (the mitigation, to see whether it is ever needed).

    trained=True (the round-7 verdict's follow-through): instead of the
    formula weight table (a spark.range literal), TRAIN a d60-style
    per-bucket polarity table from the zipf corpus itself — the hot
    bucket then carries a data-derived weight like every other bucket,
    so the measurement confirms the "salting unnecessary at <=10% hot
    mass" rule holds when the weight table is an aggregate of the
    skewed data rather than a synthetic literal (same row count, same
    join key distribution on the PROBE side — the physics that could
    differ is the build side's provenance and partitioning)."""
    from pyspark.sql import functions as F

    from etl_docker_spark.session import get_spark

    path = "/tmp/skew_corpus/zipf_docs.parquet"
    build_zipf_corpus(n_docs, hot_frac, path)
    spark = get_spark("zipf_skew_bench")
    docs = spark.read.parquet(path)
    docs.count()

    buckets = 4096
    bucket = (f"pmod(CAST(conv(substring(md5(f), 1, 8), 16, 10) AS BIGINT), "
              f"{buckets})")
    occ = (docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("f"))
           .select("doc_id", F.expr(bucket).alias("bucket")))
    if trained:
        # d60's training arithmetic on the zipf corpus: synthetic label
        # y = doc_id % 3 > 0, per-bucket centered polarity in ppm. The
        # result is a DATA-DERIVED <=4096-row table (hot buckets get
        # trained weights too); checkpointed so training cost is paid
        # once, outside the timed join-shape runs.
        lab = occ.withColumn("y", (F.col("doc_id") % 3 > 0).cast("long"))
        counts = (lab.groupBy("bucket")
                  .agg(F.sum("y").alias("n1"),
                       F.sum(1 - F.col("y")).alias("n0")))
        prior = counts.agg(F.sum("n1").alias("g1"), F.sum("n0").alias("g0"))
        weights = (counts.crossJoin(F.broadcast(prior))
                   .select("bucket", F.expr(
                       "(n1 - n0) * 1000000 DIV (n1 + n0) "
                       "- (g1 - g0) * 1000000 DIV (g1 + g0)")
                       .alias("w_ppm"))
                   .localCheckpoint())
    else:
        weights = (spark.range(buckets)
                   .select(F.col("id").alias("bucket"),
                           (F.col("id") % 2001 - 1000).alias("w_ppm")))

    def score(joined):
        return (joined.groupBy("doc_id")
                .agg(F.sum("w_ppm").alias("s"), F.count("*").alias("n")))

    def run(tag: str, df) -> dict:
        t0 = time.perf_counter()
        n = df.count()
        return {"wall_s": round(time.perf_counter() - t0, 2), "rows": n}

    out: dict = {"mode": "zipf_classifier_join", "n_docs": n_docs,
                 "hot_frac": hot_frac, "buckets": buckets,
                 "weights": "trained" if trained else "formula"}

    # 1. broadcast: per-row hash lookup, no shuffle by bucket at all —
    #    feature skew cannot matter (the hot bucket is just a hot hash
    #    slot); this is the shape every <=few-hundred-MB model should use
    out["broadcast"] = run(
        "broadcast", score(occ.join(F.broadcast(weights), "bucket")))

    # 2. forced shuffle join (the only option once the model is multi-GB
    #    and bucketed on the join key) — AQE ON, its skew-join splitter
    #    allowed to do its job
    shuffled = score(occ.hint("shuffle_hash")
                     .join(weights.hint("shuffle_hash"), "bucket"))
    out["shuffle_aqe"] = run("shuffle_aqe", shuffled)

    # 3. salted shuffle join: weight rows replicated SALTS ways, feature
    #    side picks a deterministic salt — the classic mitigation, priced
    #    so SCALE.md can say whether it is ever worth the replication
    salts = 16
    wsalt = weights.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    osalt = occ.withColumn("salt",
                           F.pmod(F.col("doc_id"), F.lit(salts)).cast("int"))
    salted = score(osalt.hint("shuffle_hash")
                   .join(wsalt.hint("shuffle_hash"), ["bucket", "salt"]))
    out["shuffle_salted_16"] = run("salted", salted)

    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("zipf", "zipf-trained"):
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
        hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
        zipf_classifier_join(n_docs, hot_frac,
                             trained=sys.argv[1] == "zipf-trained")
        return
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    path = "/tmp/skew_corpus/embeddings.parquet"
    build(n_total, hot_frac, path)

    from etl_docker_spark.llm.similarity import bucketed_near_dup_pairs
    from etl_docker_spark.session import get_spark

    spark = get_spark("skew_bench")
    corpus = spark.read.parquet(path)
    corpus.count()  # warm the scan

    modes = (("uncapped", None), ("cell_cap_256", 256))
    if len(sys.argv) > 3 and sys.argv[3] == "capped_only":
        modes = (("cell_cap_256", 256),)
    out: dict = {"n_total": n_total, "hot_frac": hot_frac}
    for mode, cap in modes:
        t0 = time.perf_counter()
        n_pairs = bucketed_near_dup_pairs(
            corpus, threshold=0.4, cell_cap=cap).count()
        out[mode] = {"wall_s": round(time.perf_counter() - t0, 2),
                     "pairs": n_pairs}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
