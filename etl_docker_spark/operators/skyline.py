"""Distributed skyline (Pareto frontier) — maximize two columns.

A point p is DOMINATED when some q has q.x >= p.x and q.y >= p.y with at
least one strict inequality; the skyline is the undominated set (exact
duplicates of a frontier point all survive — nothing strictly beats
them). The relational encoding is a NOT EXISTS anti-self-join, which a
naive engine evaluates as an O(n^2) nested loop over the full table —
the plan that dies at 100 TB.

The classic distributed formulation (e.g. the partition-merge scheme in
the skyline literature) keeps the quadratic work off the big frame:

  1. LOCAL skyline per partition (vectorized O(n log n) sort-sweep).
     Safe: a globally-undominated point is undominated in any subset, so
     phase 1 never drops a frontier point — it only shrinks the data.
  2. Union of local skylines is tiny (expected O(log^2 n) per partition
     for roughly-independent dimensions), so the exact final pass runs
     the same sweep on ONE coalesced partition — the TakeOrdered shape:
     per-partition reduction first, single-task pass only on the
     already-reduced frame.

The sweep itself: sort by (x desc, y desc); a row survives iff its y
strictly exceeds the running max-y over all strictly-greater x AND
equals the max-y within its own x group (ties on both coordinates all
survive). Property-tested against the brute-force O(n^2) definition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, x_col: str, y_col: str) -> pd.DataFrame:
    """Exact skyline of one in-memory frame (vectorized sort-sweep)."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    x = pdf[x_col].to_numpy()
    y = pdf[y_col].to_numpy()
    order = np.lexsort((-y, -x))          # x desc, then y desc
    xs, ys = x[order], y[order]
    new_x = np.ones(len(xs), dtype=bool)
    new_x[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(new_x) - 1            # x-group index per row
    gmax = ys[new_x]                      # max y per group (y desc in group)
    keep_sorted = ys == gmax[gid]         # y == max within own x group
    if len(gmax) > 1:
        # survive only if y STRICTLY beats every group with larger x
        prefix = np.maximum.accumulate(gmax)
        later = gid > 0
        keep_sorted[later] &= ys[later] > prefix[gid[later] - 1]
    keep = np.zeros(len(xs), dtype=bool)
    keep[order] = keep_sorted
    return pdf[keep]


def pareto_frontier(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Skyline of `df` maximizing (`x_col`, `y_col`), both numeric.

    Two mapInPandas passes: per-partition local skyline, then the exact
    sweep over the single-partition union of local skylines. Each pass
    concatenates its partition's Arrow batches first — the sweep needs
    the whole partition at once (a per-batch sweep would be a valid
    phase-1 reducer but phase 2 must be exact).
    """
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if parts:
            yield _sweep(pd.concat(parts, ignore_index=True), x_col, y_col)

    reduced = df.mapInPandas(local, schema)
    return reduced.coalesce(1).mapInPandas(local, schema)
