"""Orchestration tests: DAG error isolation, retries, bookmarks."""

from __future__ import annotations

import datetime as dt

from etl_docker_spark.orchestration import Bookmarks, JobContext, Task, run_dag


def ctx_for(spark, tmp_path) -> JobContext:
    return JobContext(spark, str(tmp_path / "wh"), str(tmp_path / "log"),
                      str(tmp_path / "q"))


def test_dag_error_isolation_and_deps(spark, tmp_path):
    ctx = ctx_for(spark, tmp_path)
    ran = []

    def ok(name):
        def fn(c):
            ran.append(name)
            return 1
        return fn

    def boom(c):
        raise RuntimeError("load failed")

    status = run_dag(ctx, [
        Task("families", ok("families")),
        Task("categories", boom, retries=1, retry_delay_s=0.0),
        Task("items", ok("items"), depends_on=("categories",)),   # must skip
        Task("suppliers", ok("suppliers")),                        # independent -> runs
    ])
    assert status == {"families": "ok", "categories": "failed",
                      "items": "skipped", "suppliers": "ok"}
    assert ran == ["families", "suppliers"]

    log = spark.read.parquet(ctx.log_path)
    by_table = {r.load_table: r.status_ok for r in log.collect()}
    assert by_table == {"families": True, "categories": False,
                       "items": False, "suppliers": True}


def test_retry_then_success(spark, tmp_path):
    ctx = ctx_for(spark, tmp_path)
    attempts = []

    def flaky(c):
        attempts.append(1)
        if len(attempts) < 2:
            raise RuntimeError("transient")
        return 5

    status = run_dag(ctx, [Task("flaky", flaky, retries=2, retry_delay_s=0.0)])
    assert status == {"flaky": "ok"} and len(attempts) == 2


def test_bookmarks(spark, tmp_path):
    ctx = ctx_for(spark, tmp_path)
    bm = Bookmarks(ctx)
    # first run: weekday-aware fallback window (Wed -> yesterday..yesterday)
    w = bm.next_window("sales", run_date=dt.date(2026, 8, 12))
    assert w == (dt.date(2026, 8, 11), dt.date(2026, 8, 11))
    bm.advance("sales", dt.date(2026, 8, 11))
    # second run resumes after the bookmark
    w2 = bm.next_window("sales", run_date=dt.date(2026, 8, 14))
    assert w2 == (dt.date(2026, 8, 12), dt.date(2026, 8, 13))
    # unrelated job still gets the fallback
    assert bm.next_window("items", run_date=dt.date(2026, 8, 10)) == \
        (dt.date(2026, 8, 7), dt.date(2026, 8, 9))
