"""Min-merge bench runs into one artifact (provenance recorded).

Batch queries reproduce within noise across bench.py runs, but the
STREAMING family's walls swing up to ~2.5x BETWEEN sessions in both
directions (micro-batch machinery timing: state-store maintenance
threads, checkpoint fsyncs, GC alignment — s25 measured 18.2 s in one
run and 44.1 s in the next with zero code change, and the reverse for
s15). Within-run best-of-N cannot flush session-scoped slowness, so the
committed artifact is the per-query MIN across complete sentinel-clean
runs: every inflation source is additive noise, so the min is the
consistent estimator of the engine's quiet-box cost — the number a user
should capacity-plan against, and the one an isolated re-measure
reproduces.

Usage: python tools/merge_bench.py [--allow-unverified] out.json run1.json
       run2.json [...]

Refuses runs whose sf/reps disagree or whose query sets differ (a merge
across different surfaces or scales would be meaningless), and runs with
a missing or out-of-bounds contention sentinel (a pre-sentinel or
contaminated run would otherwise poison the min — pass
--allow-unverified to override explicitly). The output carries
`merged_runs`, per-run totals, and per-query medians so both estimators
(warm floor and typical run) are in the artifact.
"""

from __future__ import annotations

import json
import statistics
import sys

SENTINEL_MAX_SPREAD = 1.5  # bench.py's own refusal threshold


def merge(runs: list[dict], allow_unverified: bool = False) -> dict:
    assert runs, "need at least one run"
    base = runs[0]
    if not allow_unverified:
        for i, r in enumerate(runs):
            spread = r.get("sentinel_spread")
            if spread is None or spread > SENTINEL_MAX_SPREAD:
                raise SystemExit(
                    f"refusing to merge run {i}: sentinel_spread={spread!r} "
                    f"(missing or > {SENTINEL_MAX_SPREAD}) — a pre-sentinel "
                    f"or contaminated run would poison the min; pass "
                    f"--allow-unverified to override")
    for r in runs[1:]:
        if r["sf"] != base["sf"] or r["reps"] != base["reps"]:
            raise SystemExit("refusing to merge: sf/reps differ across runs")
        if set(r["queries"]) != set(base["queries"]):
            raise SystemExit("refusing to merge: query sets differ")
    queries = {name: min(r["queries"][name] for r in runs)
               for name in base["queries"]}
    medians = {name: round(statistics.median(
        r["queries"][name] for r in runs), 3) for name in base["queries"]}
    return {
        "sf": base["sf"],
        "reps": base["reps"],
        "artifact_cache": base.get("artifact_cache", "cold"),
        "merged_runs": len(runs),
        "run_totals_sec": [r["total_sec"] for r in runs],
        "sentinel_spreads": [r.get("sentinel_spread") for r in runs],
        # provenance for hot-start acceptances: a run admitted via the
        # warmup carve-out has a rest-only sentinel_spread; its full
        # start-inclusive spread is surfaced here so consumers can
        # discount its pre-first-checkpoint timings (r10 ADVICE)
        "warmup_carveouts": [bool(r.get("warmup_carveout"))
                             for r in runs],
        "start_anchor_spreads": [r.get("start_anchor_spread")
                                 for r in runs],
        "total_sec": round(sum(queries.values()), 3),
        "total_median_sec": round(sum(medians.values()), 3),
        "queries": queries,
        "queries_median": medians,
    }


def main() -> None:
    args = sys.argv[1:]
    allow = "--allow-unverified" in args
    args = [a for a in args if a != "--allow-unverified"]
    if len(args) < 2:
        raise SystemExit(__doc__)
    out_path, run_paths = args[0], args[1:]
    runs = [json.load(open(p)) for p in run_paths]
    merged = merge(runs, allow_unverified=allow)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"merged_runs": merged["merged_runs"],
                      "total_sec": merged["total_sec"],
                      "run_totals_sec": merged["run_totals_sec"]}))


if __name__ == "__main__":
    main()
