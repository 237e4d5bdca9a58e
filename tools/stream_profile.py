"""Micro-batch profiler for the streaming family (guide §1).

Attaches a StreamingQueryListener before running a query builder, then
aggregates every micro-batch's `durationMs` breakdown (addBatch,
getBatch, latestOffset, queryPlanning, walCommit, commitOffsets,
triggerExecution) and state-operator metrics (commit time, rows,
memory). This is the streaming equivalent of reading the stage page:
it says whether a 16 s wall is Python-boundary compute (addBatch),
offset-log fsyncs (walCommit/commitOffsets), planning, or state-store
commits.

Usage: python tools/stream_profile.py [--sf DIR] [--reps N] query [...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from etl_docker_spark.plans import QUERIES
    from etl_docker_spark.session import get_spark

    progresses: list[dict] = []

    class Collector(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark = get_spark("stream_profile")
    spark.streams.addListener(Collector())
    from etl_docker_spark.catalog import TABLES, load_table
    for name in TABLES:
        load_table(spark, args.sf, name).limit(1).count()

    for name in args.queries:
        spec = QUERIES[name]
        for rep in range(args.reps):
            progresses.clear()
            t0 = time.perf_counter()
            df = spec.builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            # listener events arrive asynchronously; give the bus a beat
            time.sleep(1.0)
            durs: dict[str, float] = defaultdict(float)
            state: dict[str, float] = defaultdict(float)
            n_batches = 0
            rows_total = 0
            for p in progresses:
                n_batches += 1
                rows_total += p.get("numInputRows", 0)
                for k, v in (p.get("durationMs") or {}).items():
                    durs[k] += v
                for op in p.get("stateOperators") or []:
                    for k, v in op.items():
                        if isinstance(v, (int, float)):
                            state[k] += v
            print(f"\n=== {name} rep {rep}: wall {wall:.2f}s, "
                  f"{n_batches} batches, {rows_total} input rows")
            trig = durs.get("triggerExecution", 0.0)
            print(f"  sum(triggerExecution) {trig / 1000:.2f}s; "
                  f"non-trigger wall {wall - trig / 1000:.2f}s")
            for k in sorted(durs, key=lambda k: -durs[k]):
                print(f"    durationMs.{k:<22} {durs[k] / 1000:7.2f}s")
            interesting = ("commitTimeMs", "timeRemovedMs",
                           "allUpdatesTimeMs", "allRemovalsTimeMs",
                           "numRowsTotal", "numRowsUpdated",
                           "numStateStoreInstances")
            for k in interesting:
                if k in state:
                    unit = "s" if k.endswith("Ms") else ""
                    val = state[k] / 1000 if k.endswith("Ms") else state[k]
                    print(f"    state.{k:<25} {val:10.2f}{unit}")


if __name__ == "__main__":
    main()
