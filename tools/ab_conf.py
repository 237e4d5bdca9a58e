"""Config A/B harness (guide §9: config last, measured, never blind).

Runs a query list through the noop sink under a baseline session and
under one or more candidate conf overlays, each in its OWN subprocess
(a SparkSession can't change static-ish planner confs reliably
mid-flight, and JIT/codegen warmth must not leak between arms), and
prints a per-query table of best-of-N walls.

Usage:
  python tools/ab_conf.py --reps 2 --queries q03,q05,... \
      --arm "smj_off:spark.sql.join.preferSortMergeJoin=false" \
      --arm "zstd:spark.io.compression.codec=zstd"

Each --arm is label:key=value[,key=value...]. The baseline arm always
runs first. Arms run interleaved (baseline, arm1, arm2, baseline, ...)
rep by rep is NOT done — each arm is one subprocess that does its own
reps — so bracket A/Bs with a quiet-host microbench.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from etl_docker_spark.session import get_spark
conf = json.loads(os.environ.get("AB_CONF", "{{}}"))
spark = get_spark("ab_conf", extra_conf=conf)
from etl_docker_spark.plans import QUERIES
from etl_docker_spark.catalog import TABLES, load_table
sf = {sf!r}
for name in TABLES:
    load_table(spark, sf, name).limit(1).count()
out = {{}}
for name in {names!r}:
    spec = QUERIES[name]
    best = None
    for rep in range({reps}):
        t0 = time.perf_counter()
        df = spec.builder(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    out[name] = round(best, 3)
print("AB_RESULT " + json.dumps(out))
"""


def run_arm(repo: str, sf: str, names: list[str], reps: int,
            conf: dict[str, str]) -> dict[str, float]:
    env = dict(os.environ)
    env["AB_CONF"] = json.dumps(conf)
    code = _CHILD.format(repo=repo, sf=sf, names=names, reps=reps)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise SystemExit(f"arm failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--arm", action="append", default=[],
                    help="label:key=value[,key=value...]")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = args.queries.split(",")
    arms: list[tuple[str, dict[str, str]]] = [("baseline", {})]
    for spec in args.arm:
        label, kvs = spec.split(":", 1)
        conf = dict(kv.split("=", 1) for kv in kvs.split(","))
        arms.append((label, conf))

    results = {}
    for label, conf in arms:
        print(f"running arm {label} ...", file=sys.stderr)
        results[label] = run_arm(repo, args.sf, names, args.reps, conf)

    labels = [label for label, _ in arms]
    print("| query | " + " | ".join(labels) + " |")
    print("|---|" + "---|" * len(labels))
    for name in names:
        cells = " | ".join(f"{results[label][name]:.3f}" for label in labels)
        print(f"| {name} | {cells} |")
    totals = " | ".join(f"{sum(results[label].values()):.2f}"
                        for label in labels)
    print(f"| TOTAL | {totals} |")


if __name__ == "__main__":
    main()
