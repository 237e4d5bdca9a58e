"""Benchmark harness: runs the declared query surface end-to-end.

Each query executes to completion through the `noop` sink (full computation,
no driver-side collection — the same shape as writing results to a table).
Prints ONE JSON line: {"metric", "value", "unit": "sec", "queries", "sf"}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_docker_spark.plans import QUERIES  # noqa: E402
from etl_docker_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")

    # warmup: JVM + parquet footers, so query 1 doesn't absorb session startup
    from etl_docker_spark.catalog import TABLES, load_table
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(1).count()

    # best-of-N per query: scheduling noise on a busy box is +/- 1-2 s,
    # which would otherwise dominate sub-second queries
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in QUERIES.items():
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        total += best

    out = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # measured-once larger-SF numbers (full surface at ~sf1; see SCALE.md) —
    # cached so the per-round bench stays fast. Regenerate with:
    #   python tools/make_scale_corpus.py 10 /root/testdata/sf0.1 /tmp/scale_10x
    #   SPARK_GRAFT_SF_DIR=/tmp/scale_10x python bench.py > BENCH_SF1.json
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_SF1.json")
    if os.path.exists(cache) and "sf0.1" in os.path.normpath(sf_dir):
        try:
            with open(cache) as fh:
                out["larger_sf_cached"] = json.load(fh)
        except Exception:
            pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
