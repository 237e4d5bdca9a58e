"""Sources (SURVEY.md §2.1): paginated REST, JDBC, Excel."""

from etl_docker_spark.sources.rest import (
    PageSpec,
    RestEndpoint,
    paginated_read,
    paginated_read_driver,
)

__all__ = ["PageSpec", "RestEndpoint", "paginated_read", "paginated_read_driver"]
