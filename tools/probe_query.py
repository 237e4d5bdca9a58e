"""Per-query measurement probe for optimization rounds (guide §1).

Times individual queries through the noop sink (full computation, no
sink cost) and optionally dumps `.explain("formatted")` for each into a
plans snapshot directory — the before/after evidence the optimization
judge reads.

Usage:
  python tools/probe_query.py [--sf DIR] [--reps N] [--plans OUTDIR] \
      [--label TAG] query [query ...]

Prints one line per query: `<name> <best>s  (runs: r1 r2 ...)`.
Plan files land at OUTDIR/<query>_<TAG>.txt (TAG default "before").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--label", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from etl_docker_spark.plans import QUERIES
    from etl_docker_spark.session import get_spark
    from tools.plan_audit import formatted_plan

    names = []
    for q in args.queries:
        if q in QUERIES:
            names.append(q)
        else:  # prefix match convenience
            hits = [n for n in QUERIES if n.startswith(q)]
            if len(hits) != 1:
                raise SystemExit(f"unknown query {q!r} (hits: {hits})")
            names.append(hits[0])

    spark = get_spark("probe")
    from etl_docker_spark.catalog import TABLES, load_table
    for name in TABLES:
        load_table(spark, args.sf, name).limit(1).count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in names:
        spec = QUERIES[name]
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            start = time.perf_counter()
            df = spec.builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            df = spec.builder(spark, args.sf)
            path = os.path.join(args.plans, f"{name}_{args.label}.txt")
            with open(path, "w") as f:
                f.write(formatted_plan(df))
        print(f"{name} {min(runs):.3f}s  (runs: "
              + " ".join(f"{r:.3f}" for r in runs) + ")", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
