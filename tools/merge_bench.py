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


def union_runs(runs: list[dict]) -> dict:
    """Assemble DISJOINT slice runs (bench.py SPARK_GRAFT_BENCH_SLICE)
    into one full-surface run record. Each slice carries its own
    sentinel verdict, so the same refusal rule applies per slice;
    query sets must not overlap (a query timed twice means the slices
    were mis-specified). The result looks like a single run — it can
    be min-merged with other runs — and records per-slice provenance
    ("slices": spec list, "sentinel_spreads" per slice)."""
    assert runs, "need at least one slice run"
    base = runs[0]
    for i, r in enumerate(runs):
        spread = r.get("sentinel_spread")
        if spread is None or spread > SENTINEL_MAX_SPREAD:
            raise SystemExit(
                f"refusing slice {i}: sentinel_spread={spread!r}")
        if r["sf"] != base["sf"] or r["reps"] != base["reps"]:
            raise SystemExit("refusing union: sf/reps differ")
    queries: dict[str, float] = {}
    for i, r in enumerate(runs):
        overlap = set(queries) & set(r["queries"])
        if overlap:
            raise SystemExit(
                f"refusing union: slice {i} re-times {sorted(overlap)[:3]}")
        queries.update(r["queries"])
    return {
        "sf": base["sf"],
        "reps": base["reps"],
        "artifact_cache": base.get("artifact_cache", "cold"),
        "slices": [r.get("slice") for r in runs],
        "sentinel_spread": max(r["sentinel_spread"] for r in runs),
        "sentinel_spreads": [r["sentinel_spread"] for r in runs],
        "total_sec": round(sum(queries.values()), 3),
        "queries": queries,
    }


def fold(new_run: dict, committed: dict) -> dict:
    """Fold one fresh full-surface run into the committed floor
    artifact: per-query MIN on the common set, the fresh value for
    queries the committed artifact has never seen (surface growth).
    This is how a single quiet-window run repairs wave-damaged floors
    (VERDICT r10 item 2) without discarding the older, still-valid
    minima. Committed floors for queries no longer in the surface are
    dropped. Provenance: merged_runs increments, and the fold is
    recorded under "folded"."""
    if new_run.get("sentinel_spread") is None \
            or new_run["sentinel_spread"] > SENTINEL_MAX_SPREAD:
        raise SystemExit("refusing fold: new run not sentinel-clean")
    if new_run["sf"] != committed["sf"]:
        raise SystemExit("refusing fold: sf differs")
    old_q = committed["queries"]
    queries = {name: (min(v, old_q[name]) if name in old_q else v)
               for name, v in new_run["queries"].items()}
    out = dict(committed)
    out["queries"] = queries
    out["total_sec"] = round(sum(queries.values()), 3)
    out["merged_runs"] = committed.get("merged_runs", 1) + 1
    out["sentinel_spreads"] = (committed.get("sentinel_spreads", [])
                               + [new_run["sentinel_spread"]])
    out["run_totals_sec"] = (committed.get("run_totals_sec", [])
                             + [new_run["total_sec"]])
    folds = list(committed.get("folded", []))
    folds.append({
        "n_queries": len(new_run["queries"]),
        "new_queries": sorted(set(new_run["queries"]) - set(old_q)),
        "dropped_queries": sorted(set(old_q) - set(new_run["queries"])),
        "improved": sum(1 for n, v in new_run["queries"].items()
                        if n in old_q and v < old_q[n]),
        "sentinel_spread": new_run["sentinel_spread"],
        "slices": new_run.get("slices"),
    })
    out["folded"] = folds
    # medians are only meaningful across aligned full runs; after a
    # surface-changing fold the old median set is stale — drop it
    # rather than publish medians over mismatched surfaces
    out.pop("queries_median", None)
    out.pop("total_median_sec", None)
    return out


def main() -> None:
    args = sys.argv[1:]
    allow = "--allow-unverified" in args
    union = "--union" in args
    do_fold = "--fold" in args
    args = [a for a in args
            if a not in ("--allow-unverified", "--union", "--fold")]
    if len(args) < 2:
        raise SystemExit(__doc__)
    out_path, run_paths = args[0], args[1:]
    runs = [json.load(open(p)) for p in run_paths]
    if union:
        merged = union_runs(runs)
    elif do_fold:
        if len(runs) != 2:
            raise SystemExit("--fold needs exactly: new_run committed")
        merged = fold(runs[0], runs[1])
    else:
        merged = merge(runs, allow_unverified=allow)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"mode": ("union" if union else
                               "fold" if do_fold else "merge"),
                      "n_queries": len(merged["queries"]),
                      "total_sec": merged["total_sec"]}))


if __name__ == "__main__":
    main()
