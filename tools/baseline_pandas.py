"""Single-node pandas baseline for BASELINE.md context.

The reference architecture is single-threaded pandas; it publishes no
numbers, so this measures the SAME computations the engine's headline
queries perform, written idiomatically in pandas over the same parquet
inputs. Output: one JSON line comparable with bench.py.

Usage: python tools/baseline_pandas.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
import time

import pandas as pd


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    timings: dict[str, float] = {}

    lineitem = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    events = pd.read_parquet(f"{sf_dir}/events.parquet")
    # replicated corpora store ts as raw int64 nanos (no parquet logical
    # type survives the replication round-trip) — same adaptation as the
    # engine catalog
    if not pd.api.types.is_datetime64_any_dtype(events["ts"]):
        events["ts"] = pd.to_datetime(events["ts"], unit="ns")

    t0 = time.perf_counter()
    l = lineitem[lineitem.l_shipdate <= pd.Timestamp("1998-09-02")]
    disc_price = l.l_extendedprice * (1 - l.l_discount)
    g = l.assign(disc_price=disc_price,
                 charge=disc_price * (1 + l.l_tax)).groupby(
        ["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"), sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"), sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"), count_order=("l_quantity", "size"))
    timings["q01_pricing_summary"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cust = customer.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    cust = cust.merge(region[region.r_name == "ASIA"],
                      left_on="n_regionkey", right_on="r_regionkey")
    o = orders.merge(cust[["c_custkey", "n_name"]], left_on="o_custkey",
                     right_on="c_custkey")
    li = lineitem.merge(o[["o_orderkey", "n_name"]], left_on="l_orderkey",
                        right_on="o_orderkey")
    li.assign(rev=li.l_extendedprice * (1 - li.l_discount)).groupby("n_name").agg(
        revenue=("rev", "sum"), n_orders=("o_orderkey", "nunique"))
    timings["q02_revenue_by_nation"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).groupby(
        "o_custkey").tail(1)
    timings["q07_latest_order_per_customer"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    ev = events.assign(day=events.ts.dt.floor("D"))
    ev.groupby(["day", "event_type"]).agg(
        n_events=("event_id", "size"), total_value=("value", "sum"),
        n_users=("user_id", "nunique"))
    timings["q12_event_daily_rollup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    so = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    so.assign(running=so.groupby("o_custkey").o_totalprice.cumsum())
    timings["q14_running_spend"] = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "metric": "pandas_singlenode_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec", "queries": timings,
        "sf": float(m.group(1)) if m else -1.0,
    }))


if __name__ == "__main__":
    main()
