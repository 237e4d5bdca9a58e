"""Benchmark harness: runs the declared query surface end-to-end.

Each query executes to completion through the `noop` sink (full computation,
no driver-side collection — the same shape as writing results to a table).

Output contract (the driver captures only the LAST ~2,000 characters of
stdout, so the printed payload must be SMALL):
  - per-query timings -> a RUN-STAMPED file under bench_runs/ (gitignored).
    bench.py never writes the committed BENCH_QUERIES.json itself — only
    tools/merge_bench.py does, from one or more run files (VERDICT r8
    item 4: a driver-invoked single run used to overwrite the committed
    multi-run merge in the working tree, shadowing the floor artifact).
  - final stdout line -> ONE compact JSON object with SCALARS ONLY:
    {"metric","value","unit","sf","n_queries","reps","artifact_cache",
     "per_query_file"} — ~200 chars, an order of magnitude under the
    driver's tail window. tests/test_bench_contract.py pins the length.
Everything else (progress lines) goes to stderr.

Env: SPARK_GRAFT_SF_DIR       (default /root/testdata/sf0.1)
     SPARK_GRAFT_CPUS         (default all cores)
     SPARK_GRAFT_BENCH_REPS   (default 2, best-of-N)
     SPARK_GRAFT_ARTIFACT_DIR (index-artifact disk cache; the bench pins
                               this to a fresh temp dir unless already set,
                               so timings never depend on a warm cache left
                               by a previous run — see ADVICE r2)
     SPARK_GRAFT_BENCH_SLICE  ("i/n": run only the i-th of n contiguous
                               slices of the query list (1-based). For
                               hosts that degrade in waves shorter than a
                               full sweep (round 11: quiet ~10-minute
                               stretches between 2-5x waves killed two
                               full runs at the 3/4 mark): each slice
                               fits inside a quiet window, carries its
                               own sentinel verdict, and only the slice a
                               wave hits needs re-running. Slice run
                               files record "slice" and are unioned into
                               one full-surface run by
                               tools/merge_bench.py --union.)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
from typing import NamedTuple

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Committed artifact name — written ONLY by tools/merge_bench.py; bench.py
# itself writes each run to bench_runs/run_<epoch>.json (see module doc).
PER_QUERY_FILE = "BENCH_QUERIES.json"
RUN_DIR = "bench_runs"


def run_file_name(epoch: int) -> str:
    return os.path.join(RUN_DIR, f"run_{epoch}.json")

# Contention sentinel (round-6 verdict item 1): the round-6 artifact was
# taken on a loaded box and overstated the engine ~20-30% (d11 committed
# at 7.48 s, reproduces at 0.94 s on a quiet machine). A fixed anchor
# query is re-timed at start / middle / end of the sweep; if the box's
# throughput drifted more than SENTINEL_MAX_SPREAD across the run, the
# per-query artifact is NOT written — a contaminated artifact is worse
# than no artifact, because it silently misprices every query.
SENTINEL_ANCHOR = "q01_pricing_summary"
SENTINEL_MAX_SPREAD = 1.5


class SentinelVerdict(NamedTuple):
    """quiet: accept the run. spread: the spread the run was JUDGED on
    (the rest-of-run spread when the warmup carve-out fires, else the
    full spread). full_spread: max/min over ALL anchors, always — so a
    carve-out acceptance is never indistinguishable downstream from a
    genuinely quiet run (r10 ADVICE, medium). warmup_carveout: True
    exactly when the carve-out did the accepting."""

    quiet: bool
    spread: float
    full_spread: float = 1.0
    warmup_carveout: bool = False


def sentinel_verdict(anchor_times: list[float],
                     max_spread: float = SENTINEL_MAX_SPREAD
                     ) -> SentinelVerdict:
    """Pure decision function (unit-tested): given the anchor query's
    wall times across the run, decide whether the box was quiet.
    Degenerate inputs (fewer than 2 samples, or a ~0 floor) count as
    quiet — the sentinel only ever REFUSES on positive evidence of
    drift.

    Warmup carve-out (round-9 diagnosis, first enforced round 10 after
    two runs died on it): a START anchor that is the STRICT unique
    maximum with everything after it quiet is residual warmup the
    stabilization loop didn't flush, not contention — contamination
    looks like the REVERSE (later anchors inflating). In that case
    judge the spread of the remaining anchors; early queries mispriced
    high are absorbed by the cross-run min-merge, while refusing the
    run wastes its whole budget. A later anchor that exactly TIES the
    start is not warmup evidence (r10 ADVICE): the comparison is
    strictly `start > max(rest)`."""
    if len(anchor_times) < 2 or min(anchor_times) <= 1e-6:
        return SentinelVerdict(True, 1.0)
    spread = round(max(anchor_times) / min(anchor_times), 3)
    if spread <= max_spread:
        return SentinelVerdict(True, spread, spread)
    rest = anchor_times[1:]
    if (len(rest) >= 2 and anchor_times[0] > max(rest)
            and min(rest) > 1e-6
            and max(rest) / min(rest) <= max_spread):
        return SentinelVerdict(True, round(max(rest) / min(rest), 3),
                               spread, True)
    return SentinelVerdict(False, spread, spread)


def bench_slice(names: list[str], spec: str) -> list[str]:
    """Contiguous 1-based slice "i/n" of the query list. Pure function
    (unit-tested): the n slices partition the list exactly — no query
    is dropped or duplicated across i = 1..n."""
    i_s, n_s = spec.split("/")
    i, n = int(i_s), int(n_s)
    if not (1 <= i <= n):
        raise SystemExit(f"bad slice spec {spec!r}: need 1 <= i <= n")
    per = -(-len(names) // n)  # ceil division
    out = names[(i - 1) * per: i * per]
    if not out:
        raise SystemExit(f"slice {spec!r} is empty for {len(names)} queries")
    return out


def summary_payload(total: float, sf: float, n_queries: int, reps: int,
                    artifact_state: str,
                    sentinel_spread: float = 1.0,
                    artifact_written: bool = True,
                    per_query_file: str | None = None,
                    warmup_carveout: bool = False,
                    start_anchor_spread: float | None = None) -> dict:
    """The ENTIRE final stdout line — scalars only, never per-query maps.

    Keep this a pure function: tests/test_bench_contract.py asserts the
    serialized form stays far below the driver's 2,000-char tail capture.
    """
    payload = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": n_queries,
        "reps": reps,
        "artifact_cache": artifact_state,
        # a refused run wrote NO file — never point consumers at the
        # committed multi-run merge as if this run produced it
        "per_query_file": ((per_query_file or PER_QUERY_FILE)
                           if artifact_written else None),
        "sentinel_spread": sentinel_spread,
        "artifact_written": artifact_written,
    }
    # When the warmup carve-out accepted the run, sentinel_spread is the
    # REST-only spread — flag it and carry the full start-inclusive
    # spread so merge tooling / single-run artifact consumers can see
    # the accepted run had a hot start (r10 ADVICE, medium).
    if warmup_carveout:
        payload["warmup_carveout"] = True
        payload["start_anchor_spread"] = start_anchor_spread
    return payload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Give the single-JVM session bench-appropriate heap unless pinned:
    # the default 8g is fine for one query, but a 236-query sweep
    # accumulates every memoized index artifact (localCheckpoint blocks)
    # plus streaming state in one heap, and round 9 measured the END
    # sentinel anchor at ~2x its middle reading on an idle box — GC
    # pressure from heap exhaustion, which mispriced every late-sweep
    # query and tripped the contention sentinel with no contention.
    # 24g on the 128 GiB target leaves the page cache untouched.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    # Pin the artifact disk cache to a throwaway dir so every bench run
    # trains from cold and numbers are comparable across runs/machines.
    # A caller who explicitly wants warm-cache numbers sets the env var.
    artifact_state = "pinned-env"
    tmp_cache = None
    if not os.environ.get("SPARK_GRAFT_ARTIFACT_DIR"):
        tmp_cache = tempfile.mkdtemp(prefix="bench-artifacts-")
        os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = tmp_cache
        artifact_state = "cold"

    from etl_docker_spark.plans import QUERIES
    from etl_docker_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: JVM + parquet footers, so query 1 doesn't absorb session startup
    from etl_docker_spark.catalog import TABLES, load_table
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(1).count()

    # Pre-warm the STREAMING machinery: the micro-batch/state-store code
    # paths JIT-compile on first use and the s-family's walls converge
    # ~2.5x from cold to warm (s25 measured 25.6 -> 10.4 s over reps in
    # one session; SCALE.md round-7 diagnosis). One throwaway stream run
    # here moves every s-query's measurement toward its warm floor, so a
    # single bench run approximates what the cross-run min-merge
    # previously had to recover. Disable: SPARK_GRAFT_BENCH_STREAM_WARMUP=0
    if os.environ.get("SPARK_GRAFT_BENCH_STREAM_WARMUP", "1") != "0":
        warm = QUERIES.get("s01_stream_tumbling")
        if warm is not None:
            try:
                warm.builder(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                print("[bench] stream machinery pre-warmed (s01)",
                      file=sys.stderr)
            except Exception as exc:  # never let warmup kill the bench
                print(f"[bench] stream pre-warm failed: {exc}",
                      file=sys.stderr)

    # Pre-warm the PYTHON STATEFUL WORKER pool: s14/s15's floor is the
    # applyInPandasWithState path (Python daemon fork + Arrow codec +
    # state-protocol code), which the JVM-side s01 pre-warm above never
    # touches — their first timed run otherwise absorbs the cold start
    # that the round-7 min-merge had to flush across runs. One throwaway
    # 256-row micro-stream through the same operator warms it in ~2 s.
    # Disable: SPARK_GRAFT_BENCH_PYWORKER_WARMUP=0
    if os.environ.get("SPARK_GRAFT_BENCH_PYWORKER_WARMUP", "1") != "0":
        try:
            from pyspark.sql import functions as F

            from etl_docker_spark.plans._util import stream_state_partitions
            from etl_docker_spark.streaming.stateful import \
                running_user_totals
            wdir = tempfile.mkdtemp(prefix="bench-pywarm-")
            try:
                src = os.path.join(wdir, "src")
                (spark.range(256)
                 .select((F.col("id") % 16).alias("user_id"),
                         F.timestamp_micros(F.col("id") * 1_000_000)
                         .alias("ts"),
                         (F.col("id") * 1.0).alias("value"))
                 .write.parquet(src))
                probe = spark.read.parquet(src)
                with stream_state_partitions(spark, 4):
                    # both stateful code paths: plain NoTimeout update AND
                    # the watermark + EventTimeTimeout TTL machinery
                    # (s14/s15's exact shape — timeout registration and
                    # eviction JIT separately from the plain update)
                    for kwargs in ({}, {"ttl_ms": 60_000,
                                        "watermark_delay": "0 seconds"}):
                        stream = (spark.readStream
                                  .schema(probe.schema).parquet(src))
                        q = (running_user_totals(stream, **kwargs)
                             .writeStream.outputMode("update").format("noop")
                             .trigger(availableNow=True).start())
                        q.awaitTermination(120)
                        q.stop()
                print("[bench] python stateful worker pre-warmed",
                      file=sys.stderr)
            finally:
                shutil.rmtree(wdir, ignore_errors=True)
        except Exception as exc:  # never let warmup kill the bench
            print(f"[bench] python worker pre-warm failed: {exc}",
                  file=sys.stderr)

    # Pre-warm the PLAIN mapInPandas Python-worker path: the stateful
    # pre-warm above forks its own daemon workers, but the batch
    # mapInPandas operator (d12/d40's feature-extraction shape) JITs a
    # separate JVM-side ArrowEvalPython/MapInPandas pipeline — the
    # driver's round-8 run read d12 at 12.2 s vs the committed 0.84 s
    # floor, the same cold-start artifact class (VERDICT r8 item 3).
    # One throwaway 256-row micro-batch retires it in ~1 s.
    # Disable: SPARK_GRAFT_BENCH_MAPINPANDAS_WARMUP=0
    if os.environ.get("SPARK_GRAFT_BENCH_MAPINPANDAS_WARMUP", "1") != "0":
        try:
            def _identity_batches(batches):
                yield from batches

            (spark.range(256).selectExpr("id", "cast(id as double) v")
             .mapInPandas(_identity_batches, "id long, v double")
             .write.format("noop").mode("overwrite").save())
            print("[bench] mapInPandas worker pre-warmed", file=sys.stderr)
        except Exception as exc:  # never let warmup kill the bench
            print(f"[bench] mapInPandas pre-warm failed: {exc}",
                  file=sys.stderr)

    # best-of-N per query: scheduling noise on a busy box is +/- 1-2 s,
    # which would otherwise dominate sub-second queries
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def run_once(spec) -> float:
        start = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    def time_query(spec) -> float:
        return min(run_once(spec) for _ in range(reps))

    anchor_spec = QUERIES.get(SENTINEL_ANCHOR)
    anchor_times: list[float] = []

    def probe_anchor(tag: str) -> None:
        if anchor_spec is None:
            return
        wall = time_query(anchor_spec)
        anchor_times.append(wall)
        print(f"[bench] sentinel {tag}: {wall:.3f}s", file=sys.stderr)

    # Warm the anchor UNTIMED until it stabilizes: the first executions
    # absorb JVM/codegen/GC warmup that best-of-N doesn't flush. One
    # untimed run was not enough — round 9 measured quiet-box start
    # anchors at ~1.5x the middle anchor (1.35 s vs 0.90 s with zero
    # ambient load), refusing perfectly clean runs — so keep re-running
    # (up to 5) until the reading stops improving materially. The probe
    # should measure the BOX, not leftover warmup (a slow START with a
    # fast END is warmup; the round-6 contamination was the reverse).
    if anchor_spec is not None:
        prev = run_once(anchor_spec)
        for _ in range(4):
            cur = run_once(anchor_spec)
            if cur >= prev * 0.85:
                break
            prev = cur
    probe_anchor("start")
    timings: dict[str, float] = {}
    total = 0.0
    aborted = False
    names = list(QUERIES)
    slice_spec = os.environ.get("SPARK_GRAFT_BENCH_SLICE")
    if slice_spec:
        names = bench_slice(names, slice_spec)
        print(f"[bench] slice {slice_spec}: {len(names)} queries "
              f"({names[0]}..{names[-1]})", file=sys.stderr)
    # Abort EARLY on a contended box (r9 verdict item 6: the 713.5 s
    # outlier run completed fully before being discarded — a third of
    # the bench budget gone). Probe the anchor at the quarter points;
    # the moment the spread exceeds the threshold, stop timing — the
    # run file would be refused anyway, so finishing only burns budget.
    checkpoints = {len(names) // 4: "quarter",
                   len(names) // 2: "middle",
                   (3 * len(names)) // 4: "three-quarter"}
    for i, name in enumerate(names):
        tag = checkpoints.get(i)
        if tag is not None:
            probe_anchor(tag)
            v = sentinel_verdict(anchor_times)
            # Abort the moment the run is IRRECOVERABLY refused. With
            # >= 2 post-start anchors, a refusal is final: the full
            # spread only grows as anchors append, and the warmup
            # carve-out's conditions (start strictly above max(rest),
            # rest-spread under threshold) can only become false, never
            # true. With a single post-start anchor, a slow START over
            # a quiet later box is the warmup asymmetry — keep going
            # and let the carve-out decide; late inflation (newest
            # anchor is the max) is real contention either way (r10
            # ADVICE: the old last==max-only rule let sustained
            # contention that peaked at the quarter anchor run the
            # whole remaining surface before the end verdict).
            doomed = (len(anchor_times) >= 3
                      or anchor_times[-1] == max(anchor_times))
            if not v.quiet and doomed:
                print(f"[bench] ABORT at {tag} ({i}/{len(names)}): "
                      f"anchor spread {v.spread}x exceeds "
                      f"{SENTINEL_MAX_SPREAD}x", file=sys.stderr)
                aborted = True
                break
        best = time_query(QUERIES[name])
        timings[name] = round(best, 3)
        total += best
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)
    if not aborted:
        probe_anchor("end")

    verdict = sentinel_verdict(anchor_times)
    quiet, spread = verdict.quiet, verdict.spread

    # Per-query map goes to a FILE, never stdout: 148+ timings are ~4 KB
    # of JSON, which overflows the driver's tail capture and made rounds
    # 2-3 unparseable. Each run writes its OWN stamped file under
    # bench_runs/ (gitignored) — the committed BENCH_QUERIES.json is
    # produced only by tools/merge_bench.py over sentinel-clean runs, so
    # a driver-invoked single run can never shadow the multi-run floor
    # artifact in the working tree (VERDICT r8 item 4). On a contended
    # box the run file is REFUSED (stale numbers misprice the engine;
    # see the sentinel comment above) — the summary line still reports
    # the total with artifact_written=false so the refusal is visible.
    here = os.path.dirname(os.path.abspath(__file__))
    run_path = run_file_name(int(time.time()))
    if quiet:
        os.makedirs(os.path.join(here, RUN_DIR), exist_ok=True)
        run_record = {"sf": sf, "reps": reps,
                      "artifact_cache": artifact_state,
                      "sentinel_spread": spread,
                      "total_sec": round(total, 3), "queries": timings}
        if slice_spec:
            run_record["slice"] = slice_spec
        if verdict.warmup_carveout:
            # flag hot-start acceptances in the run file itself so
            # merge tooling can discount pre-first-checkpoint timings
            run_record["warmup_carveout"] = True
            run_record["start_anchor_spread"] = verdict.full_spread
        with open(os.path.join(here, run_path), "w") as f:
            json.dump(run_record, f, indent=1, sort_keys=True)
        print(f"[bench] per-query timings -> {run_path}", file=sys.stderr)
    else:
        print(f"[bench] CONTENTION: anchor spread {spread}x exceeds "
              f"{SENTINEL_MAX_SPREAD}x — run file NOT written; "
              "re-run on a quiet box", file=sys.stderr)

    out = summary_payload(total, sf, len(timings), reps, artifact_state,
                          sentinel_spread=spread, artifact_written=quiet,
                          per_query_file=run_path if quiet else None,
                          warmup_carveout=verdict.warmup_carveout,
                          start_anchor_spread=(verdict.full_spread
                                               if verdict.warmup_carveout
                                               else None))
    spark.stop()
    if tmp_cache:
        shutil.rmtree(tmp_cache, ignore_errors=True)
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
