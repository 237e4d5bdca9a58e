"""Query registry: every declared query with its DuckDB oracle."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_docker_spark.plans.advanced import ADVANCED
from etl_docker_spark.plans.extended import EXTENDED
from etl_docker_spark.plans.llm_queries import LLM_QUERIES
from etl_docker_spark.plans.relational import RELATIONAL
from etl_docker_spark.plans.round2 import ROUND2
from etl_docker_spark.plans.round2b import ROUND2B
from etl_docker_spark.plans.round2c import ROUND2C
from etl_docker_spark.plans.round2d import ROUND2D
from etl_docker_spark.plans.round2e import ROUND2E
from etl_docker_spark.plans.round2f import ROUND2F
from etl_docker_spark.plans.round2g import ROUND2G
from etl_docker_spark.plans.round2h import ROUND2H
from etl_docker_spark.plans.round2i import ROUND2I
from etl_docker_spark.plans.round2j import ROUND2J
from etl_docker_spark.plans.round2k import ROUND2K
from etl_docker_spark.plans.round2l import ROUND2L
from etl_docker_spark.plans.round2m import ROUND2M
from etl_docker_spark.plans.round2n import ROUND2N
from etl_docker_spark.plans.round2o import ROUND2O
from etl_docker_spark.plans.round2p import ROUND2P
from etl_docker_spark.plans.round2q import ROUND2Q
from etl_docker_spark.plans.round3 import ROUND3

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


def _build() -> dict[str, QuerySpec]:
    specs: dict[str, QuerySpec] = {}
    for table in (RELATIONAL, LLM_QUERIES, ADVANCED, EXTENDED, ROUND2,
                  ROUND2B, ROUND2C, ROUND2D, ROUND2E, ROUND2F, ROUND2G,
                  ROUND2H, ROUND2I, ROUND2J, ROUND2K, ROUND2L, ROUND2M,
                  ROUND2N, ROUND2O, ROUND2P, ROUND2Q, ROUND3):
        for name, (builder, oracle) in table.items():
            specs[name] = QuerySpec(name, builder, oracle)
    return specs


QUERIES: dict[str, QuerySpec] = _build()


def get_query(name: str) -> QuerySpec:
    return QUERIES[name]
