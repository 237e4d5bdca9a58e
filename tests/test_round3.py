"""Round-3 additions: row-level quarantine routing and the
approximate-accuracy tolerance gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_route_rows_to_quarantine_splits_and_audits(spark, tmp_path):
    from etl_docker_spark.sinks.writers import route_rows_to_quarantine

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7 == 0).alias("bad_flag"))
    qdir, log = str(tmp_path / "quar"), str(tmp_path / "audit")
    clean = route_rows_to_quarantine(
        df, ~F.col("bad_flag"), qdir, log_path=log, load_table="probe")

    clean_ids = {r["id"] for r in clean.collect()}
    quar_ids = {r["id"] for r in spark.read.parquet(qdir).collect()}
    assert clean_ids == {i for i in range(100) if i % 7 != 0}
    assert quar_ids == {i for i in range(100) if i % 7 == 0}
    assert clean_ids.isdisjoint(quar_ids)
    assert len(clean_ids) + len(quar_ids) == 100

    audit = spark.read.parquet(log).collect()
    assert len(audit) == 1
    assert audit[0]["load_table"] == "probe"
    assert audit[0]["total_records"] == len(quar_ids)


def test_q58_tolerance_actually_binds(spark):
    """The within_tol column is a real comparison, not a constant: at the
    smoke SF every group passes AND the exact counts are genuine."""
    from etl_docker_spark.plans.round3 import q58_approx_distinct

    rows = q58_approx_distinct(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r["within_tol"] for r in rows)
    assert all(r["exact_users"] > 0 for r in rows)


def test_q59_bounds_bracket_exact_percentile(spark):
    from etl_docker_spark.plans.round3 import q59_approx_percentile

    rows = q59_approx_percentile(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]


def test_d36_merge_property_holds(spark):
    from etl_docker_spark.plans.round3 import d36_sketch_shard_merge

    rows = d36_sketch_shard_merge(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["merge_matches_global"]
        # KMV error at k=64 is ~12% (1/sqrt(k-1)); allow 4 sigma
        assert abs(r["est_distinct"] - r["exact_distinct"]) \
            <= 0.5 * r["exact_distinct"] + 1
