"""Smoke: every declared query builds and runs at sf0.001.

(The full value-level oracle comparison lives in tools/check_oracle.py and
the driver's CORRECTNESS gate; this keeps `pytest` self-contained and fast.)
"""

from __future__ import annotations

import pytest

from etl_docker_spark.plans import QUERIES
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.builder(spark, SF_SMOKE)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
