"""Build an N-times scale-up corpus from a testdata sf dir (for SCALE.md).

Replication keeps per-replica semantics intact while keeping cross-replica
outputs LINEAR in N:
- fact/bridge keys (orderkey, custkey, doc_id, event_id, user_id, vec_id)
  shift by replica * 10^9, so intra-replica joins still match and replicas
  never collide;
- dimension tables (region/nation/supplier/part) are shared, as they would
  be at 100 TB;
- document text gets every token prefixed with a replica tag — without it,
  replicas are exact duplicates of each other and every near-dup query's
  output (and runtime) goes quadratic in N, which measures the corpus, not
  the engine.

Usage: python tools/make_scale_corpus.py <mult> [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SHIFT = 10 ** 9
DIMS = ("region", "nation", "supplier", "part")
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    mult = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scale_{mult}x"

    from etl_docker_spark.catalog import load_table
    from etl_docker_spark.session import get_spark

    spark = get_spark("make_scale_corpus")
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        shutil.copy(f"{src}/{name}.parquet", f"{out}/{name}.parquet")

    for name, keys in KEYS.items():
        # RAW read, not load_table: the catalog converts events.ts from
        # int64-nanos to timestamp, and writing that back would change the
        # physical layout (INT96) — replicas must mirror the source bytes
        # so schema-sensitive readers (the file-stream source) see one shape
        base = spark.read.parquet(f"{src}/{name}.parquet")
        parts = []
        for i in range(mult):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if name == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"r{i}_$1"))
            if name == "customer" and i > 0:
                # replica-tag customer names for the same reason as
                # document text: d70/d71 key fuzzy dedup off c_name, and
                # exact cross-replica name duplicates would make their
                # candidate sets quadratic in N. The tag is the replica
                # digit string repeated 4x, so ANY two replica tags are
                # at edit distance >= 4 — beyond every fuzzy tier's
                # verify bound (<= 2), so cross-replica pairs stay
                # non-candidates and outputs stay linear.
                df = df.withColumn(
                    "c_name", F.concat(F.lit(str(i) * 4 + "-"),
                                       F.col("c_name")))
            if name == "embeddings" and i > 0:
                # shift the first coordinate far out per replica: exact
                # cross-replica vector duplicates would otherwise make every
                # bucketed/near-dup query quadratic in N (same reason the
                # document text gets a replica tag)
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.array((F.element_at("embedding", 1)
                                 + F.lit(float(i * 8))).cast("float")),
                        F.slice("embedding", 2, F.size("embedding") - 1),
                    ))
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        dst = f"{out}/{name}.parquet"
        union.coalesce(max(4, mult)).write.mode("overwrite").parquet(dst + ".dir")
        # the catalog reads <table>.parquet paths; keep the directory layout
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
        os.rename(dst + ".dir", dst)
        print(f"{name}: {mult}x written")
    spark.stop()


if __name__ == "__main__":
    main()
