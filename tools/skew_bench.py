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


def main() -> None:
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
