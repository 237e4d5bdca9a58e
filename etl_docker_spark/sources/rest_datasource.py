"""Spark 4 Python DataSource for the paginated REST API (SURVEY.md S1-S4).

The production-shaped upgrade of sources.rest: the endpoint becomes a real
`spark.read.format(...)` relation —

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("paginated_rest")
          .schema(endpoint_schema_ddl)
          .option("fetcher", "my_pkg.my_mod:fetch_page")   # importable ref
          .option("num_pages", "40")
          .option("page_size", "250")
          .option("rate_limit_s", "0")
          .option("param.date_from", "01/03/2024")         # pushed filters
          .load())

Each page is an InputPartition, so pages fetch IN PARALLEL on executors,
rate-limited per task; predicates arrive as request params (`param.*`) —
the manual pushdown the reference hand-rolls per endpoint (API_IPN.py:
171-189) expressed once as reader options. The fetch callable is resolved
by import path on the executor (no pickling of clients), keeping the
engine HTTP-library-agnostic.
"""

from __future__ import annotations

import importlib
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def _resolve(ref: str):
    """'pkg.mod:attr' -> the attribute (executor-side import)."""
    mod_name, _, attr = ref.partition(":")
    if not attr:
        raise ValueError(f"fetcher must be 'module:function', got {ref!r}")
    return getattr(importlib.import_module(mod_name), attr)


class _PagePartition(InputPartition):
    def __init__(self, page: int) -> None:
        self.page = page


class RestDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.fetcher_ref = options["fetcher"]
        self.num_pages = int(options.get("num_pages", "1"))
        self.rate_limit_s = float(options.get("rate_limit_s", "0"))
        self.params = {k[len("param."):]: v for k, v in options.items()
                       if k.startswith("param.")}
        self.field_names = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        return [_PagePartition(i) for i in range(self.num_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetch = _resolve(self.fetcher_ref)
        records = fetch(partition.page, self.params)
        if self.rate_limit_s:
            time.sleep(self.rate_limit_s)
        for rec in records:
            yield tuple(rec.get(name) for name in self.field_names)


class RestDataSource(DataSource):
    """format("paginated_rest") — one generic source for ~20 endpoints."""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> str:
        raise NotImplementedError(
            "paginated_rest has no fixed schema; pass .schema(...) per endpoint")

    def reader(self, schema: StructType) -> RestDataSourceReader:
        return RestDataSourceReader(schema, self.options)
