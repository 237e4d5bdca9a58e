"""Paginated REST source (SURVEY.md S1-S4).

The reference's extract layer is ~20 endpoint classes around one offset-
pagination loop (`paginatedApiCall`, API_IPN.py:78-129): GET page i until an
empty page, 250 records/page, optional 1 s inter-page sleep, date filters
serialized dd/MM/yyyy, and a per-company/store loop (multi-tenancy).

Spark-first redesign — one GENERIC source, not 20 classes:

- An endpoint is data (`RestEndpoint`): path, schema, param mapping. The
  reference's per-endpoint classes collapse into a catalog of these.
- Filter pushdown: date-window / company / store predicates become request
  params via `param_fn` — the manual pushdown the reference does by hand
  (API_IPN.py:171-189), expressed once.
- Distributed fetch: pages are enumerated on the driver (one cheap count
  request) and fetched on EXECUTORS via `mapInPandas` over a page-number
  DataFrame — parallel across pages, rate-limited per partition, no
  driver-side accumulation of 100 TB. At cluster scale this is the same
  shape as a Spark 4 Python DataSource (a natural upgrade path).
- The fetch callable is injected, so tests run against a deterministic fake
  and production swaps in an HTTP client; the engine itself never imports
  `requests`.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Mapping
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fetch(page_index, params) -> list of JSON records for that page ([] = past end)
FetchFn = Callable[[int, Mapping[str, str]], list[dict]]


@dataclass(frozen=True)
class PageSpec:
    """Pagination contract of the endpoint (API_IPN.py:108-129 semantics)."""

    page_size: int = 250          # API_IPN.py:339, 583-585
    rate_limit_s: float = 0.0     # API_IPN.py:267 uses 1.0 for throttled endpoints
    max_pages: int = 100_000      # hard stop against infinite pagination


@dataclass(frozen=True)
class RestEndpoint:
    """One typed endpoint: the datum that replaces a reference endpoint class."""

    name: str
    schema: T.StructType
    page: PageSpec = field(default_factory=PageSpec)
    # maps logical predicates (date_from, date_to, company_id, ...) to params
    param_fn: Callable[[Mapping], Mapping[str, str]] = lambda p: {k: str(v) for k, v in p.items()}


def get_one(spark: SparkSession, endpoint: RestEndpoint, fetch: FetchFn,
            entity_id, predicates: Mapping | None = None) -> DataFrame:
    """S2: single-record GET (`/{id}/`) as a one-row DataFrame.

    A client convenience, not an engine operator (the reference has ~10 of
    these, API_IPN.py:141-170 et al.); the id rides along as a param."""
    params = dict(endpoint.param_fn(predicates or {}))
    params["id"] = str(entity_id)
    rows = fetch(0, params)
    return spark.createDataFrame(rows[:1], schema=endpoint.schema)  # type: ignore[arg-type]


def paginated_read_driver(spark: SparkSession, endpoint: RestEndpoint,
                          fetch: FetchFn, predicates: Mapping | None = None) -> DataFrame:
    """Small-result path: sequential driver-side page loop (the reference's
    shape), then one createDataFrame. Use for dimension-sized endpoints."""
    params = endpoint.param_fn(predicates or {})
    rows: list[dict] = []
    for i in range(endpoint.page.max_pages):
        batch = fetch(i, params)
        if not batch:
            break
        rows.extend(batch)
        if endpoint.page.rate_limit_s:
            time.sleep(endpoint.page.rate_limit_s)
    return spark.createDataFrame(rows, schema=endpoint.schema)  # type: ignore[arg-type]


def paginated_read(spark: SparkSession, endpoint: RestEndpoint, fetch: FetchFn,
                   num_pages: int, predicates: Mapping | None = None,
                   parallelism: int | None = None) -> DataFrame:
    """Scale path: fetch `num_pages` pages on executors in parallel.

    `num_pages` comes from the endpoint's Total_pages field (one probe call —
    FIXTURES.md A14 envelope). Each executor task walks its slice of pages,
    honoring the endpoint rate limit per task.
    """
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    params = dict(endpoint.param_fn(predicates or {}))
    rate = endpoint.page.rate_limit_s
    schema = endpoint.schema
    col_names = [f.name for f in schema.fields]

    pages = (
        spark.range(num_pages)
        .withColumnRenamed("id", "page")
        .repartition(min(parallelism, max(1, num_pages)), F.col("page"))
    )

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for page in pdf["page"].tolist():
                recs = fetch(int(page), params)
                if recs:
                    yield pd.DataFrame.from_records(recs, columns=col_names)
                if rate:
                    time.sleep(rate)

    return pages.mapInPandas(fetch_pages, schema=schema)
