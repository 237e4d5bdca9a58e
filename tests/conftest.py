from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_docker_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # executor Python workers must be able to import the repo package and the
    # test modules whose closures mapInPandas pickles by reference
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = f"{repo}:{os.path.join(repo, 'tests')}"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    spark = get_spark("tests")
    yield spark
    spark.stop()
