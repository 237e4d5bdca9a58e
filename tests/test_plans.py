"""Physical-plan regression tests — the scale contract, checked.

Correctness says WHAT a query returns; these assert HOW it executes:
filters reach the parquet scan, projections prune columns, small dims
broadcast (no fact shuffle), aggregations are partial. A regression here
is invisible at sf0.01 and catastrophic at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from etl_docker_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


def formatted_plan(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def scan_read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan)


def tree_ops(plan: str) -> list[str]:
    """Operator names from the numbered detail headers (each appears once)."""
    return re.findall(r"^\(\d+\) (\w+)", plan, flags=re.MULTILINE)


def test_q06_filter_pushdown(spark):
    plan = formatted_plan(spark, "q06_discount_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan   # date window pushed to scan
    assert "LessThan(l_quantity" in plan
    schemas = scan_read_schemas(plan)
    # column pruning: exactly the 4 needed lineitem columns are read
    assert any(s.count(":") == 4 and "l_discount" in s for s in schemas), schemas


def test_q02_broadcasts_dims(spark):
    plan = formatted_plan(spark, "q02_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # the region/nation/customer chain must not shuffle the lineitem side
    assert "SortMergeJoin" not in plan


def test_q20_two_broadcast_hops_no_shuffle_join(spark):
    plan = formatted_plan(spark, "q20_supplier_nation_revenue")
    assert tree_ops(plan).count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # lineitem scan pruned to join key + the two money columns
    schemas = scan_read_schemas(plan)
    assert any(s == "struct<l_suppkey:bigint,l_extendedprice:double,l_discount:double>"
               for s in schemas), schemas


def test_q01_partial_aggregation(spark):
    ops = tree_ops(formatted_plan(spark, "q01_pricing_summary"))
    # partial (map-side) agg before the single exchange, final after
    assert ops.count("HashAggregate") == 2
    assert ops.count("Exchange") == 1


def test_q14_single_window_shuffle(spark):
    ops = tree_ops(formatted_plan(spark, "q14_running_spend"))
    assert "Window" in ops
    assert ops.count("Exchange") == 1  # one shuffle on the partition key


def test_d01_narrow_dedup_shuffle(spark):
    plan = formatted_plan(spark, "d01_exact_dedup")
    # shuffle rows are (digest, id), never the document text
    assert re.search(r"hashpartitioning\(fp", plan), plan[:500]


def _operator_plan(spark, name: str) -> str:
    """Plan of the RAW LSH operator over the smoke documents table.

    The registry queries (d06/d11) now serve a per-session memoized frame
    (llm/index_cache) whose plan is just the checkpoint scan; these tests
    pin the plan of the pipeline that BUILDS that frame, so they call the
    operator directly."""
    from etl_docker_spark.llm.dedup import (minhash_lsh_pairs,
                                            simhash_near_dup_pairs)
    from etl_docker_spark.plans._util import t

    docs = t(spark, SF_SMOKE, "documents")
    if name == "d06_minhash_pairs":
        df = minhash_lsh_pairs(docs, "doc_id", "text")
    else:
        df = simhash_near_dup_pairs(docs, "doc_id", "text")
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_no_cartesian_products(spark):
    for name in ("d06_minhash_pairs", "e02_bucketed_near_dup", "q23_asof_last_order"):
        plan = (_operator_plan(spark, name) if name == "d06_minhash_pairs"
                else formatted_plan(spark, name))
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", ["q04_priority_with_returns", "q05_customers_without_orders"])
def test_semi_anti_stay_joins(spark, name):
    plan = formatted_plan(spark, name)
    # membership tests must be joins, not collected driver-side IN lists
    assert "Join" in plan


@pytest.mark.parametrize("name", ["d06_minhash_pairs", "d11_simhash_pairs"])
def test_lsh_single_corpus_pass(spark, name):
    """The LSH pipelines materialize one per-doc frame (localCheckpoint) and
    every downstream branch reads it: at most ONE shuffle Exchange (the
    id fan-out) and zero recomputation of the scan+hash corpus pass."""
    plan = _operator_plan(spark, name)
    ops = tree_ops(plan)
    assert ops.count("Exchange") <= 1, plan
    assert ops.count("Scan parquet") <= 1, plan
    # candidate + verification joins all broadcast the tiny per-doc frames
    assert not [o for o in ops if "SortMergeJoin" in o], plan


def test_fan_out_noop_on_wide_input(spark):
    """fan_out must not inject a RoundRobin exchange when the corpus is
    already at cluster parallelism — at 100 TB the scan arrives parallel
    and an unconditional repartition is a full shuffle of raw vectors."""
    from pyspark.sql import functions as F

    from etl_docker_spark.llm.similarity import brute_force_knn, fan_out

    target = spark.sparkContext.defaultParallelism
    wide = (spark.range(200)
            .select(F.col("id").alias("vec_id"),
                    F.array(*[(F.col("id") * (i + 1) % 7).cast("float")
                              for i in range(4)]).alias("embedding"))
            .repartition(target))
    assert fan_out(wide) is wide
    q = wide.filter(F.col("vec_id") < 2)
    explain = lambda df: df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    # the only RoundRobin in the knn plan is the fixture's own repartition —
    # the operator adds none on top
    baseline = explain(wide).count("RoundRobinPartitioning")
    plan = explain(brute_force_knn(wide, q, k=3))
    assert plan.count("RoundRobinPartitioning") == baseline, plan


def test_fan_out_widens_narrow_input(spark):
    from etl_docker_spark.llm.similarity import fan_out

    narrow = spark.range(100).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism


def test_registry_complete_and_oracle_backed(spark):
    """Every registered query must carry an oracle (the driver's correctness
    gate enumerates queries(); a registration without an oracle silently
    downgrades to rows-only — q31 missed round 1's gate this way). Pin the
    full name set so additions/removals are always a conscious diff."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only_allowed = set()  # every current query is SQL-expressible
    missing = set(qs) - set(oracles) - rows_only_allowed
    assert not missing, f"queries without an oracle: {sorted(missing)}"
    expected = {
        *(f"q{i:02d}" for i in range(1, 106)),
        *(f"d{i:02d}" for i in range(1, 76)),
        *(f"e{i:02d}" for i in range(1, 25)),
        *(f"s{i:02d}" for i in range(1, 34)),
        "g01", "g02", "g03", "g04", "g05", "g06", "g07", "g08", "g09",
    }
    assert {n.split("_")[0] for n in qs} == expected


def test_gate_window_samples_every_round(spark):
    """The external gate checks the FIRST 50 registry entries only; pin
    that the window IS registry._GATE_WINDOW (build order must not leak
    in ahead of it) and the invariants that make the window useful:
    every never-externally-verified registration from the two newest
    rounds is under the gate, round-1 anchors stay sampled, and every
    query family is represented. Rotation details live in
    registry._GATE_WINDOW's comments — duplicating the full list here
    is exactly what went stale in rounds 8 and 9."""
    import __spark_entry__ as entrymod
    from etl_docker_spark.plans import registry

    first50 = list(entrymod.queries())[:50]
    assert first50 == list(registry._GATE_WINDOW)
    window = set(first50)
    # newest registrations (staged in round 10's plans/round12.py,
    # registered round 11, never externally verified) MUST be gated
    assert {"d74_topk_state_lifecycle",
            "g09_recursive_path_cost",
            "d75_transposed_typo_dedup",
            "q105_validate_utf8_battery"} <= window
    # previous round's registrations stay gated one more round
    assert {"d72_token_transposition_dedup",
            "s33_stream_json_quarantine",
            "d73_low_entropy_fuzzy_dedup",
            "q103_stats_battery", "q104_time_battery",
            "g08_recursive_reachability"} <= window
    # round-1 anchors still sampled
    assert {"q01_pricing_summary", "s01_stream_tumbling"} <= window
    # once-red family reps stay pinned (HUGEINT oracle casts /
    # global-window rewrites of round 4)
    assert {"e08_hybrid_rrf", "d24_perplexity_buckets"} <= window
    # the window spans every query family, not just the newest round
    assert {"q", "d", "e", "s", "g"} <= {n[0] for n in window}


@pytest.mark.parametrize("name", [
    "d21_bm25_search", "e08_hybrid_rrf", "d24_perplexity_buckets",
    "d25_sequence_packing", "q43_zonemap_layout", "d31_weighted_sample",
    "q14_running_spend", "d18_token_budget_curation",
    "d61_threshold_yield_curve",
])
def test_no_unbounded_global_window(spark, name):
    """Round-3 verdict: three queries still ranked/tiled through an
    unpartitioned window over a corpus-sized frame — a single task sorts
    everything at 100 TB. All were rewritten two-phase (round 4); this
    pins the plan shape for them plus the queries that always used the
    distributed form. The audit rule lives in tools/plan_audit.py and
    renders as the PLANS.md global-window column."""
    from tools.plan_audit import unbounded_global_windows

    assert unbounded_global_windows(formatted_plan(spark, name)) == 0, name


def test_q42_q58_no_expand(spark):
    """Regression pin for the multi-distinct Expand removal: both queries
    pre-aggregate to the distinct key grain, so Catalyst must not plan an
    Expand node (which would duplicate every fact row per distinct set)."""
    for name in ("q42_sole_late_supplier", "q58_approx_distinct"):
        plan = formatted_plan(spark, name)
        assert "Expand" not in tree_ops(plan), name


def test_d37_d38_prune_documents_scan(spark):
    """The curation queries never need the text column — the documents
    scan must not read it (at 100 TB text IS the table)."""
    for name in ("d37_hash_split", "d38_source_quota"):
        plan = formatted_plan(spark, name)
        for s in scan_read_schemas(plan):
            assert "text" not in s, (name, s)


def test_q62_interval_join_is_hash_not_nested_loop(spark):
    """The bucketized interval join must plan an equi hash join on the
    day key — a BETWEEN-only formulation degrades to a nested loop that
    probes every event against every window."""
    plan = formatted_plan(spark, "q62_interval_join")
    ops = tree_ops(plan)
    assert "BroadcastNestedLoopJoin" not in ops and            "CartesianProduct" not in ops, ops
    assert "BroadcastHashJoin" in ops, ops


def test_g05_prunes_part_scan_and_single_shuffle(spark):
    """Path-enumeration rollup: the part scan must read only the key and
    the rolled-up measure (at scale the dim's text columns dwarf them),
    and the whole rollup is ONE aggregation shuffle — no joins, no
    iteration."""
    plan = formatted_plan(spark, "g05_hierarchy_rollup")
    for s in scan_read_schemas(plan):
        assert "p_name" not in s and "p_type" not in s, s
    ops = tree_ops(plan)
    assert ops.count("Exchange") == 1, ops
    assert not [o for o in ops if "Join" in o], ops


def test_q71_broadcasts_universe_and_dim(spark):
    """Division-by-counting: the per-customer frame joins a 1-row
    universe and the customer dim — both broadcast; the orders fact must
    never reach a shuffle join."""
    plan = formatted_plan(spark, "q71_relational_division")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_e19_exact_work_is_shortlist_bounded(spark):
    """Two-stage serving: raw embeddings enter only through the
    shortlist join (refinement cost independent of corpus size) — the
    plan must show hash joins, never a nested-loop scan of the corpus
    against queries."""
    plan = formatted_plan(spark, "e19_adc_exact_rerank")
    assert "CartesianProduct" not in plan


def test_no_bare_conf_set_outside_util():
    """The grep-auditability contract `session_conf`'s docstring states:
    all runtime-conf mutation in plans/ goes through `_util.scoped_conf`
    / `_util.session_conf` / `_util.stream_state_partitions`, so one
    grep of _util.py audits every mutation site. A bare
    `spark.conf.set(...)` in a plan file escapes restore-discipline
    review (the round-6 s24 finding)."""
    import os

    import etl_docker_spark.plans as plans_pkg

    plans_dir = os.path.dirname(plans_pkg.__file__)
    offenders = []
    for fname in sorted(os.listdir(plans_dir)):
        if not fname.endswith(".py") or fname == "_util.py":
            continue
        with open(os.path.join(plans_dir, fname)) as f:
            for lineno, line in enumerate(f, 1):
                if ".conf.set(" in line or ".conf.unset(" in line:
                    offenders.append(f"{fname}:{lineno}: {line.strip()}")
    assert not offenders, offenders
