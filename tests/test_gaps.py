"""Tests for the gated edges: mongo guard, JDBC statement gating, get_one."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_docker_spark.sources.jdbc import execute_statement
from etl_docker_spark.sources.mongo import DeleteProtectionError, guard_delete_filter
from etl_docker_spark.sources.rest import RestEndpoint, get_one


def test_delete_protection():
    with pytest.raises(DeleteProtectionError):
        guard_delete_filter({})
    with pytest.raises(DeleteProtectionError):
        guard_delete_filter(None)
    assert guard_delete_filter({"_id": 1}) == {"_id": 1}


def test_jdbc_statement_gated(spark):
    with pytest.raises(NotImplementedError):
        execute_statement("jdbc:sqlserver://nowhere", "EXEC SINCRONIZACION_X")


def test_get_one(spark):
    schema = T.StructType([T.StructField("Id", T.LongType()),
                           T.StructField("Name", T.StringType())])
    seen = {}

    def fetch(page, params):
        seen.update(params)
        return [{"Id": int(params["id"]), "Name": "one"}]

    ep = RestEndpoint(name="items", schema=schema)
    df = get_one(spark, ep, fetch, entity_id=42)
    assert df.first().Id == 42 and seen["id"] == "42"
