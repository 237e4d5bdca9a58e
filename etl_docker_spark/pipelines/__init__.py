"""The reference's ETL pipelines rebuilt Spark-first (SURVEY.md §3, §7.2).

Each module exposes pure DataFrame->DataFrame transforms (unit-testable, no
I/O); `run_*` helpers wire them to sources/sinks. Loops over companies/
stores/pricelists in the reference become partition columns here — one
DataFrame, no driver loop.
"""

from etl_docker_spark.pipelines.sales_documents import (
    CREDIT_NOTE_TYPES,
    sales_document_tables,
    transform_sales_details,
    transform_sales_header,
    transform_sales_payments,
)

__all__ = [
    "CREDIT_NOTE_TYPES",
    "sales_document_tables",
    "transform_sales_details",
    "transform_sales_header",
    "transform_sales_payments",
]
