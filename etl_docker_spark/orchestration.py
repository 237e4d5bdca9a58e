"""Orchestration: the reference's Airflow DAG re-expressed as a job graph.

Reference (SURVEY.md §2.11): 9 sequential PythonOperator tasks in dependency
order (dag_maestros.py:112-159), weekday-aware date windows (:10-22), retry
(:33-34), per-load audit logging, per-task error isolation (continue on
failure). Here:

- O1  the DAG is an explicit ordered task list; dims load before facts.
- O2  scheduling stays outside the engine (cron/Airflow around spark-submit).
- O3  retries wrap each task (Spark task-level retries cover compute).
- O4  every task outcome lands in the audit log (sinks.audit_log_entry).
- O5  the per-company loop is gone — company_id is a column.
- O6  a failing task doesn't stop the DAG; it logs and continues (the
      reference's try/except-per-task), and the run result says who failed.
- incremental pulls use a BOOKMARK table: each job records the window it
  completed; the next run resumes from there (the reference recomputes
  yesterday's window from the wall clock — a bookmark is the idempotent,
  backfill-friendly version of the same contract).
"""

from __future__ import annotations

import datetime as dt
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_docker_spark.functions import date_window
from etl_docker_spark.sinks import audit_log_entry


@dataclass
class JobContext:
    spark: SparkSession
    warehouse: str                      # base dir for output tables
    log_path: str                       # audit log table
    quarantine: str                     # failed-batch dumps
    bookmarks_path: str = ""

    def __post_init__(self) -> None:
        self.bookmarks_path = self.bookmarks_path or f"{self.warehouse}/_bookmarks"


@dataclass
class Task:
    name: str
    fn: Callable[[JobContext], int | None]   # returns rows written (optional)
    retries: int = 1
    retry_delay_s: float = 2.0
    depends_on: Sequence[str] = field(default_factory=tuple)


def run_dag(ctx: JobContext, tasks: Sequence[Task]) -> dict[str, str]:
    """Run tasks in order with dependency + error isolation semantics.

    Returns {task_name: 'ok' | 'failed' | 'skipped'}; a task whose
    dependency failed is skipped (the reference's linear chain stops the
    chain; explicit deps make that precise).
    """
    status: dict[str, str] = {}
    for task in tasks:
        if any(status.get(dep) in ("failed", "skipped") for dep in task.depends_on):
            status[task.name] = "skipped"
            audit_log_entry(ctx.spark, ctx.log_path, task.name, None, None,
                            False, "skipped: dependency failed")
            continue
        err: str | None = None
        for attempt in range(task.retries + 1):
            try:
                rows = task.fn(ctx)
                audit_log_entry(ctx.spark, ctx.log_path, task.name,
                                rows, rows, True, None)
                status[task.name] = "ok"
                err = None
                break
            except Exception as exc:  # noqa: BLE001 — O6 error isolation
                err = f"{type(exc).__name__}: {exc}"
                if attempt < task.retries:
                    time.sleep(task.retry_delay_s * (attempt + 1))
        if err is not None:
            audit_log_entry(ctx.spark, ctx.log_path, task.name, 0, None, False, err[:2000])
            status[task.name] = "failed"
    return status


# ----------------------------------------------------------------- bookmarks


class Bookmarks:
    """Per-job incremental high-water marks in a tiny parquet table."""

    def __init__(self, ctx: JobContext) -> None:
        self.ctx = ctx
        self.path = ctx.bookmarks_path

    def last_window_end(self, job: str) -> dt.date | None:
        if not os.path.exists(self.path):
            return None
        df = self.ctx.spark.read.parquet(self.path)
        row = (df.filter(F.col("job") == job)
               .agg(F.max("window_end").alias("m")).first())
        return row.m if row and row.m else None

    def next_window(self, job: str, run_date: dt.date | None = None) -> tuple[dt.date, dt.date]:
        """Resume from the bookmark; first run falls back to the reference's
        weekday-aware yesterday window (dag_maestros.py:10-22).

        A caught-up job yields start > end (an EMPTY window) — callers must
        treat that as nothing-to-pull rather than issuing a reversed range.
        """
        run_date = run_date or dt.date.today()
        last = self.last_window_end(job)
        if last is None:
            return date_window(run_date)
        return last + dt.timedelta(days=1), run_date - dt.timedelta(days=1)

    def next_window_or_none(self, job: str,
                            run_date: dt.date | None = None) -> tuple[dt.date, dt.date] | None:
        """Like next_window, but returns None when the job is caught up —
        the safe API for callers that would otherwise send a reversed date
        range to a source."""
        start, end = self.next_window(job, run_date)
        return None if start > end else (start, end)

    def advance(self, job: str, window_end: dt.date) -> None:
        df = self.ctx.spark.createDataFrame(
            [(job, window_end)], "job string, window_end date")
        df.write.mode("append").parquet(self.path)


MASTER_DATA_ORDER = (
    "families", "categories", "trademarks", "attribute_categories",
    "attributes", "suppliers", "clients", "items", "oc_categories",
)
