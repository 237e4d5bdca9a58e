"""EP3-shaped incremental job, end to end (VERDICT r2 item 7).

Pipeline-level golden test over the fake API source: bookmark-driven
created/modified/deleted windows -> out-of-order-safe merge -> bookmark
advance. Pins (a) the golden final state, (b) re-run idempotence (second
run of a completed window is a no-op), and (c) day-at-a-time == all-at-once
(merge associativity over the window split)."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_docker_spark.orchestration import Bookmarks, JobContext
from etl_docker_spark.pipelines.incremental import (
    JOB_NAME,
    read_target,
    run_items_incremental,
)
from etl_docker_spark.sources.fake_api import fetch_items_windowed

D = dt.date.fromisoformat

GOLDEN_FINAL = {
    # Id: (Code, Description, ENABLED) as of 2024-03-13 fully loaded
    1: ("SKU-1", "alpha v1", False),    # deleted 03-12
    2: ("SKU-2", "beta v3", True),      # modified 03-10 -> 03-11 -> 03-13
    3: ("SKU-3", "gamma v2", True),     # modified 03-10 -> 03-12
    4: ("SKU-4", "delta v1", False),    # deleted 03-13 (delete beats
                                        # same-timestamp modify row)
    5: ("SKU-5", "eps v1", True),
    6: ("SKU-6", "zeta v1", True),
}


def _ctx(spark, tmp_path) -> JobContext:
    return JobContext(spark=spark, warehouse=str(tmp_path / "wh"),
                      log_path=str(tmp_path / "audit"),
                      quarantine=str(tmp_path / "quar"))


def _seed(ctx, last_done: str) -> None:
    Bookmarks(ctx).advance(JOB_NAME, D(last_done))


def _snapshot(ctx) -> dict:
    return {r["Id"]: (r["Code"], r["Description"], r["ENABLED"])
            for r in read_target(ctx).collect()}


def test_day_at_a_time_reaches_golden_state(spark, tmp_path):
    ctx = _ctx(spark, tmp_path)
    _seed(ctx, "2024-03-09")
    for run_date in ("2024-03-11", "2024-03-12", "2024-03-13", "2024-03-14"):
        res = run_items_incremental(ctx, fetch_items_windowed, D(run_date))
        assert res["status"] == "ok" and res["rows"] > 0
    assert _snapshot(ctx) == GOLDEN_FINAL


def test_rerun_same_day_is_a_noop(spark, tmp_path):
    ctx = _ctx(spark, tmp_path)
    _seed(ctx, "2024-03-09")
    run_items_incremental(ctx, fetch_items_windowed, D("2024-03-12"))
    before = _snapshot(ctx)
    bm_before = Bookmarks(ctx).last_window_end(JOB_NAME)

    res = run_items_incremental(ctx, fetch_items_windowed, D("2024-03-12"))
    assert res == {"status": "caught_up", "rows": 0}
    assert _snapshot(ctx) == before
    assert Bookmarks(ctx).last_window_end(JOB_NAME) == bm_before


def test_one_shot_equals_day_at_a_time(spark, tmp_path):
    """Backfill equivalence: one wide window produces the same snapshot as
    four daily windows — the merge is a pure function of the update SET."""
    daily, wide = _ctx(spark, tmp_path / "a"), _ctx(spark, tmp_path / "b")
    for ctx in (daily, wide):
        _seed(ctx, "2024-03-09")
    for run_date in ("2024-03-11", "2024-03-12", "2024-03-13", "2024-03-14"):
        run_items_incremental(daily, fetch_items_windowed, D(run_date))
    run_items_incremental(wide, fetch_items_windowed, D("2024-03-14"))
    assert _snapshot(daily) == _snapshot(wide) == GOLDEN_FINAL


def test_forced_replay_of_merged_batch_is_identity(spark, tmp_path,
                                                   monkeypatch):
    """Even bypassing the bookmark (crash after merge, before advance —
    the at-least-once retry path), merging the same window again leaves
    the snapshot unchanged."""
    ctx = _ctx(spark, tmp_path)
    _seed(ctx, "2024-03-09")
    run_items_incremental(ctx, fetch_items_windowed, D("2024-03-13"))
    before = _snapshot(ctx)

    # force the just-completed window to be served again
    monkeypatch.setattr(
        Bookmarks, "next_window_or_none",
        lambda self, job, run_date=None: (D("2024-03-10"), D("2024-03-12")))
    res = run_items_incremental(ctx, fetch_items_windowed, D("2024-03-13"))
    assert res["status"] == "ok" and res["rows"] > 0
    assert _snapshot(ctx) == before
