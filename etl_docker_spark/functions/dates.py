"""Date/time functions (SURVEY.md §2.8 F7-F13).

Reference behaviors (cites into /root/reference/dags/):
- F7 ISO date part (split('T')[0]): CotyData_IPN.py:1117, 2031
- F8 fixed-format timestamp parse: CotyData_IPN.py:103-104
- F9 ISO8601 / mixed-format parse: CotyData_IPN.py:698-699, 1748, 1799
- F10 dd/MM/yyyy parse: CotyData_IPN.py:1836
- F11 SQL Server 23-char datetime format: CotyData_IPN.py:1749, 1800
- F13 relative windows (yesterday / Monday covers Fri-Sun): dag_maestros.py:10-22
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def iso_date_part(col: Column | str) -> Column:
    """F7: date part of an ISO string ('2024-01-02T03:04:05' -> date 2024-01-02)."""
    return F.to_date(F.substring_index(_c(col), "T", 1))


def parse_ts_iso(col: Column | str) -> Column:
    """F8/F9: parse "yyyy-MM-dd'T'HH:mm:ss[.SSS]" (Spark parses ISO natively)."""
    return F.to_timestamp(_c(col))


def parse_ts_mixed(col: Column | str, formats: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy",
)) -> Column:
    """F9 'mixed' parse: first format that sticks wins (pandas format='mixed')."""
    c = _c(col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats])


def parse_date_dmy(col: Column | str) -> Column:
    """F10: dd/MM/yyyy -> date."""
    return F.to_date(_c(col), "dd/MM/yyyy")


def format_sqlserver_datetime(col: Column | str) -> Column:
    """F11: 23-char SQL Server datetime string (ms precision)."""
    return F.substring(F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss.SSS"), 1, 23)


def date_window(run_date: dt.date) -> tuple[dt.date, dt.date]:
    """F13: the reference's daily extraction window (dag_maestros.py:10-22).

    Yesterday..yesterday, except Mondays pull Friday..Sunday.
    Driver-side helper (feeds source predicates, not a Column).
    """
    if run_date.weekday() == 0:  # Monday
        return run_date - dt.timedelta(days=3), run_date - dt.timedelta(days=1)
    return run_date - dt.timedelta(days=1), run_date - dt.timedelta(days=1)
