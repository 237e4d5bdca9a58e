"""Physical-plan audit: one row of plan properties per declared query.

Renders PLANS.md — the at-scale health check for the whole query surface:
how many shuffles each plan has, whether small dims broadcast, whether
parquet filters/column pruning reach the scan, how wide the whole-stage
codegen spans are, and that nothing degenerates to a cartesian product.

Streaming gate queries (s01-s04) execute through the streaming engine
inside their builders, so they are listed but not plan-audited here (their
stateful plans are pinned by tests/test_streaming.py instead).

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def _top_level_lists(arguments: str) -> int:
    """Count top-level [...] lists in a node's `Arguments:` line."""
    depth = 0
    lists = 0
    for ch in arguments:
        if ch == "[":
            if depth == 0:
                lists += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return lists


_BOUNDED_NODES = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit",
                  "LocalLimit")


def unbounded_global_windows(plan: str) -> int:
    """Count WindowExec nodes that (a) have NO partition spec — the whole
    input collapses into one task's sort — AND (b) are not bounded by
    construction. Bounded means: a limit node (TakeOrderedAndProject /
    GlobalLimit / …) in the window's subtree caps its input at k rows, or
    the window orders by `__pid` (operators/prefix.py's offset-merge frame:
    one row per shuffle partition, bounded by cluster width, not data).

    An unpartitioned Window's `Arguments:` carries 2 top-level lists where
    the second is an ORDER spec (contains ASC/DESC markers) or is empty;
    a partitioned one carries 3 lists (exprs, partition, order), or 2
    where the second is a bare partition-column list (partition-only
    windows like `count(*) over (partition by k)` have no order spec).
    Anything this returns >0 for is a single-task sort over a data-sized
    frame — the plan shape that dies at 100 TB (round-3 verdict: d21/e08/
    d24). tests/test_plans.py pins this to zero across the surface.
    """
    if "== Final Plan ==" in plan:
        tree = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    else:
        tree = plan.split("\n\n")[0]
    lines = tree.split("\n")

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" +-:*"))

    details: dict[str, str] = {}
    for block in re.split(r"^(?=\(\d+\) )", plan, flags=re.M):
        m = re.match(r"^\((\d+)\) Window\s*\n", block)
        if m:
            details[m.group(1)] = block
    flagged = 0
    for i, line in enumerate(lines):
        m = re.match(r"^[\s+:*-]*Window \((\d+)\)\s*$", line)
        if not m:
            continue
        detail = details.get(m.group(1), "")
        arg = re.search(r"Arguments: (.*)", detail)
        if not arg or _top_level_lists(arg.group(1)) != 2:
            continue  # exprs + partition + order — parallel by key
        # second list is the partition spec iff it has no sort direction
        # markers (partition-only windows carry no order list at all)
        second = arg.group(1)
        second = second[second.rindex("], [") + 3:] if "], [" in second else ""
        if (second.strip(" []") and " ASC" not in second
                and " DESC" not in second):
            continue  # partition-only window — parallel by key
        if "__pid#" in arg.group(1) or "__pid ASC" in arg.group(1):
            continue  # prefix-sum offset merge: one row per partition
        my_indent = indent(line)
        subtree = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and indent(nxt) <= my_indent:
                break
            subtree.append(nxt)
        if any(any(b in s for b in _BOUNDED_NODES) for s in subtree):
            continue  # k-row input by construction
        flagged += 1
    return flagged


def audit(plan: str) -> dict[str, object]:
    # After AQE finalization the tree renders the Final Plan followed by the
    # Initial Plan, with ONE shared details list for both id ranges. Audit
    # the nodes reachable from the Final Plan tree only.
    if "== Final Plan ==" in plan:
        tree = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    else:  # non-adaptive plan: the tree is the block before the details list
        tree = plan.split("\n\n")[0]
    names: dict[str, str] = {}  # node id -> node name (from tree lines)
    # tree lines: "   +- * BroadcastHashJoin Inner BuildRight (9)" — the
    # operator name is the first identifier, the id the trailing parens
    for name, nid in re.findall(
            r"^[\s+:*-]*([A-Za-z][\w]*)[^()\n]*\((\d+)\)\s*$", tree, re.M):
        names.setdefault(nid, name)

    def n(*targets: str) -> int:
        return sum(1 for nm in names.values() if nm in targets)

    codegen_ids = {
        cg for nid, cg in re.findall(
            r"^\((\d+)\) \w[\w ]* \[codegen id : (\d+)\]", plan, re.M)
        if nid in names
    }
    return {
        # "Exchange" is the shuffle node; broadcasts are "BroadcastExchange"
        "exchanges": n("Exchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj_shj": n("SortMergeJoin", "ShuffledHashJoin"),
        "codegen": len(codegen_ids),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "pruned_scan": bool(re.search(r"ReadSchema: struct<", plan)),
        # BroadcastNestedLoopJoin over a broadcast-tiny side is the intended
        # plan for brute-force scoring (e01/e03); CartesianProduct is not
        "bnlj": n("BroadcastNestedLoopJoin"),
        "cartesian": n("CartesianProduct") > 0,
        "global_window": unbounded_global_windows(plan),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from etl_docker_spark.plans import QUERIES
    from etl_docker_spark.session import get_spark

    spark = get_spark("plan_audit")

    print("# PLANS — physical-plan audit of the declared query surface")
    print()
    print(f"Generated by tools/plan_audit.py over `{sf_dir}` "
          "(initial AQE plans; AQE may further coalesce at runtime).")
    print()
    print("Columns: shuffles = shuffle Exchange nodes; bcast = broadcast hash "
          "joins; shuffle-joins = SortMerge/ShuffledHash joins; wscg = "
          "whole-stage codegen spans; pushdown = parquet PushedFilters "
          "non-empty; bnlj = BroadcastNestedLoopJoin (accepted ONLY where "
          "the broadcast side is constant-size by construction: the "
          "brute-force scorers' query batch (e01/e03/e04), the coarse-"
          "stage query batches of e22 (matryoshka prefix) and e23 "
          "(binary signatures) — both <= 8 broadcast rows at any corpus "
          "size, k-row centroid or 1-row scalar/total frames crossJoined "
          "in e05/e08/e09/q43/q47/d31/d34/d35, d54's six 1-row "
          "winning-merge-pair broadcasts — 3 BPE steps x 2 frames, "
          "d56's |sources|^2 quota matrix (sources are a catalog, not "
          "data), d57's 1-row pool-size scalar, the d61/d62/d65 20-row "
          "literal threshold grids (spark.range) triangle-joined against "
          "20-row score histograms, d64's |sources|^2 pairwise join "
          "of theta-sketch STATES and d67's |langs|^2 triangle of HLL "
          "states plus its 1-row union-total (one fixed-size sketch per "
          "source/lang — constant at any corpus scale), d69's 1-row "
          "bitmap-total broadcast, q98's 1-row priority-roster "
          "crossJoin, the 1-row x 1-row stats crossJoins of "
          "d72/d73/d75/d76 (pair-stat and corpus-count aggregates "
          "joined for the single output row), and the K-row "
          "partition-offset "
          "triangle join in "
          "operators/prefix.py (K = partition count, constant at any "
          "data scale — replaced the unpartitioned offset window so "
          "Spark's 'No Partition Defined' WARN stays a true alarm; "
          "d18/d24/d25/d31/q43 and every prefix-sum consumer), and the "
          "k-row rank triangles of operators/rank.py (LIMIT-k or "
          "charset^2-bounded frames; d21/e08/d27 — same rationale, rank "
          "without an unpartitioned WindowExec, so the surface emits "
          "ZERO 'No Partition Defined' warnings and that line in any "
          "log is a true alarm); "
          "cartesian must be empty everywhere.")
    print()
    print("Queries serving a per-session memoized artifact "
          "(llm/index_cache: d06/d07/d08/d10/d14/d21 and the trained-index "
          "family) show their SERVING plan here — a checkpoint scan plus "
          "whatever real work remains; the plans that BUILD those "
          "artifacts are pinned separately in tests/test_plans.py "
          "(LSH single-corpus-pass, no-cartesian) and run once per "
          "session.")
    print()
    print("global-window = unpartitioned WindowExec nodes not bounded by a "
          "limit or the __pid offset-merge pattern (single-task sort over "
          "a data-sized frame — must be empty everywhere; see "
          "operators/prefix.py).")
    print()
    print("| query | shuffles | bcast | shuffle-joins | wscg | pushdown | bnlj | cartesian | global-window |")
    print("|---|---|---|---|---|---|---|---|---|")
    streaming, failures = [], []
    for name, spec in QUERIES.items():
        if re.match(r"s\d", name):
            streaming.append(name)
            continue
        try:
            df = spec.builder(spark, sf_dir)
            df.collect()  # finalize the adaptive plan (assigns codegen ids)
            a = audit(formatted_plan(df))
        except Exception as exc:  # pragma: no cover - report, don't die
            failures.append((name, str(exc)[:120]))
            continue
        print(f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj_shj']} "
              f"| {a['codegen']} | {'✓' if a['pushed'] else '—'} "
              f"| {a['bnlj'] or ''} | {'⚠' if a['cartesian'] else ''} "
              f"| {'⚠' + str(a['global_window']) if a['global_window'] else ''} |")
    print()
    if streaming:
        print(f"Streaming (audited by tests, not here): {', '.join(streaming)}.")
    if failures:
        print()
        print("Failed to audit:")
        for name, msg in failures:
            print(f"- {name}: {msg}")
    spark.stop()


if __name__ == "__main__":
    main()
