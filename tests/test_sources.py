"""Tests for the paginated REST source (fake fetcher, no network)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_docker_spark.sources import PageSpec, RestEndpoint, paginated_read, paginated_read_driver

SCHEMA = T.StructType([
    T.StructField("Id", T.LongType()),
    T.StructField("Name", T.StringType()),
])

ENDPOINT = RestEndpoint(name="families", schema=SCHEMA, page=PageSpec(page_size=3))


def fake_fetch(page: int, params):
    # 2.5 pages of 3 records -> 8 records total
    all_rows = [{"Id": i, "Name": f"fam{i}"} for i in range(8)]
    return all_rows[page * 3:(page + 1) * 3]


def test_driver_read(spark):
    df = paginated_read_driver(spark, ENDPOINT, fake_fetch)
    assert df.count() == 8
    assert df.schema == SCHEMA


def test_distributed_read(spark):
    df = paginated_read(spark, ENDPOINT, fake_fetch, num_pages=3)
    assert sorted(r.Id for r in df.collect()) == list(range(8))
    assert df.schema == SCHEMA


def test_filter_pushdown_params(spark):
    seen = {}

    def capture_fetch(page: int, params):
        seen.update(params)
        return [] if page else [{"Id": 1, "Name": "x"}]

    ep = RestEndpoint(
        name="sales", schema=SCHEMA,
        param_fn=lambda p: {"date_from": p["date_from"].strftime("%d/%m/%Y")})
    import datetime as dt

    df = paginated_read_driver(spark, ep, capture_fetch,
                               predicates={"date_from": dt.date(2024, 3, 1)})
    assert df.count() == 1
    assert seen == {"date_from": "01/03/2024"}  # dd/MM/yyyy serialization (API_IPN.py:56-58)


# ---------------------------------------------------------------- JDBC SQL


def test_mysql_upsert_sql_matches_reference_shape():
    """The generated statement is the reference's staging upsert idiom
    byte-for-byte in structure (CotyData_IPN.py:948): INSERT..SELECT from
    the staging table with ON DUPLICATE KEY UPDATE on non-key columns."""
    from etl_docker_spark.sources.jdbc import mysql_upsert_sql

    sql = mysql_upsert_sql(
        "PROVEEDORES", "CARGA_PROVEEDORES",
        ["codigo_proveedor"],
        ["codigo_proveedor", "id_razon_social_coty",
         "razon_social_proveedor", "nombre_fantasia",
         "identificador_intercompany"])
    assert sql == (
        "INSERT INTO PROVEEDORES (codigo_proveedor, id_razon_social_coty, "
        "razon_social_proveedor, nombre_fantasia, identificador_intercompany) "
        "SELECT codigo_proveedor, id_razon_social_coty, "
        "razon_social_proveedor, nombre_fantasia, identificador_intercompany "
        "FROM CARGA_PROVEEDORES "
        "ON DUPLICATE KEY UPDATE "
        "id_razon_social_coty = CARGA_PROVEEDORES.id_razon_social_coty, "
        "razon_social_proveedor = CARGA_PROVEEDORES.razon_social_proveedor, "
        "nombre_fantasia = CARGA_PROVEEDORES.nombre_fantasia, "
        "identificador_intercompany = CARGA_PROVEEDORES.identificador_intercompany")


def test_sqlserver_merge_sql_upsert_by_pk():
    from etl_docker_spark.sources.jdbc import sqlserver_merge_sql

    sql = sqlserver_merge_sql(
        "VENTAS", "STAGING_VENTAS", ["ID_VENTA", "NRO_LINEA"],
        ["ID_VENTA", "NRO_LINEA", "IMPORTE", "CANTIDAD"])
    assert sql == (
        "MERGE INTO VENTAS AS t USING STAGING_VENTAS AS s "
        "ON t.ID_VENTA = s.ID_VENTA AND t.NRO_LINEA = s.NRO_LINEA "
        "WHEN MATCHED THEN UPDATE SET t.IMPORTE = s.IMPORTE, "
        "t.CANTIDAD = s.CANTIDAD "
        "WHEN NOT MATCHED THEN INSERT (ID_VENTA, NRO_LINEA, IMPORTE, "
        "CANTIDAD) VALUES (s.ID_VENTA, s.NRO_LINEA, s.IMPORTE, s.CANTIDAD);")


def test_merge_sql_generators_reject_bad_input():
    import pytest

    from etl_docker_spark.sources.jdbc import (mysql_upsert_sql,
                                               sqlserver_merge_sql)

    for gen in (mysql_upsert_sql, sqlserver_merge_sql):
        with pytest.raises(ValueError, match="identifier"):
            gen("t; DROP TABLE x", "s", ["k"], ["k", "v"])
        with pytest.raises(ValueError, match="not in cols"):
            gen("t", "s", ["missing"], ["k", "v"])
        with pytest.raises(ValueError, match="nothing to update"):
            gen("t", "s", ["k"], ["k"])


def test_staged_merge_generates_dialect_sql(spark, monkeypatch):
    """staged_merge without explicit merge_sql derives the statement from
    the frame's columns; capture both the write and the statement without
    a live connection."""
    import etl_docker_spark.sources.jdbc as jdbc

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    captured = {}
    monkeypatch.setattr(
        jdbc, "execute_statement",
        lambda url, sql, properties=None: captured.setdefault("sql", sql))

    class FakeWriter:
        def format(self, *_): return self
        def mode(self, *_): return self
        def option(self, *_): return self
        def options(self, **_): return self
        def save(self): captured["wrote"] = True

    monkeypatch.setattr(type(df), "write", property(lambda self: FakeWriter()))
    jdbc.staged_merge(df, "jdbc:mysql://h/db", "stg", target_table="tgt",
                      key_cols=["k"], dialect="mysql")
    assert captured["wrote"]
    assert captured["sql"] == (
        "INSERT INTO tgt (k, v) SELECT k, v FROM stg "
        "ON DUPLICATE KEY UPDATE v = stg.v")


# ---------------------------------------------------------------- S4 catalog


def _fake_value(dtype, i: int):
    from pyspark.sql import types as T

    if isinstance(dtype, T.StructType):
        return {f.name: _fake_value(f.dataType, i) for f in dtype.fields}
    if isinstance(dtype, T.ArrayType):
        return [_fake_value(dtype.elementType, i)]
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return i
    if isinstance(dtype, T.DoubleType):
        return float(i) + 0.5
    if isinstance(dtype, T.BooleanType):
        return i % 2 == 0
    if isinstance(dtype, T.StringType):
        return f"s{i}"
    raise AssertionError(f"unhandled type in fake: {dtype}")


def test_serialize_params_reference_wire_format():
    import datetime

    from etl_docker_spark.sources.endpoints import serialize_params

    out = serialize_params({
        "date_from": datetime.date(2024, 3, 7),
        "stores": [1, 2, 3],
        "is_deleted": False,
        "company_id": 4,
        "skip_me": None,
    })
    assert out == {"date_from": "07/03/2024", "stores": "1,2,3",
                   "is_deleted": "false", "company_id": "4"}


def test_catalog_covers_reference_surface():
    from etl_docker_spark.sources.endpoints import ENDPOINTS

    # every reference endpoint class family is represented, incl. the three
    # the round-1 audit flagged as missing
    for required in ("sales_documents", "customers_v2", "customers_v3",
                     "delivery_notes_v2", "delivery_notes_v3", "items",
                     "b2c_orders", "employees", "expenses", "suppliers",
                     "purchase_orders", "goods_receipts", "sales_orders"):
        assert required in ENDPOINTS
    assert len(ENDPOINTS) >= 20
    from etl_docker_spark.sources.endpoints import _THROTTLED

    assert ENDPOINTS["customers_v2"].page is _THROTTLED


@pytest.mark.parametrize(
    "name", sorted(__import__("etl_docker_spark.sources.endpoints",
                              fromlist=["ENDPOINTS"]).ENDPOINTS))
def test_catalog_round_trips_through_paginated_read(spark, name):
    """Every catalog entry fetches through the executor-side reader against
    a schema-derived fake and lands with its declared schema."""
    from etl_docker_spark.sources.endpoints import ENDPOINTS
    from etl_docker_spark.sources.rest import paginated_read

    ep = ENDPOINTS[name]
    schema = ep.schema

    def fake_fetch(page: int, params: dict) -> list[dict]:
        if page >= 2:
            return []
        return [_fake_value(schema, page * 3 + j) for j in range(3)]

    # skip the real per-page sleep for the throttled entries in tests
    from dataclasses import replace

    fast = replace(ep, page=replace(ep.page, rate_limit_s=0.0))
    df = paginated_read(spark, fast, fake_fetch, num_pages=2)
    assert df.schema == schema
    rows = df.collect()
    assert len(rows) == 6


def test_csv_read_with_quarantine(spark, tmp_path):
    """PERMISSIVE CSV ingest: typed rows parse, malformed lines (bad type
    / wrong arity) land verbatim in the corrupt frame; nothing is lost."""
    from pyspark.sql import types as T

    from etl_docker_spark.sources.files import read_csv_with_quarantine

    p = tmp_path / "drop"
    p.mkdir()
    (p / "a.csv").write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "2,beta,not_a_number\n"
        "3,gamma,7.25\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ])
    clean, corrupt = read_csv_with_quarantine(spark, str(p), schema)
    assert sorted(map(tuple, clean.collect())) == [
        (1, "alpha", 10.5), (3, "gamma", 7.25)]
    bad = corrupt.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
    # total conservation
    assert clean.count() + corrupt.count() == 3


def test_jsonl_quarantine_count_safe(spark, tmp_path):
    """corrupt.count() works (the materialize step sidesteps Spark's
    corrupt-column-only pruning restriction)."""
    from pyspark.sql import types as T

    from etl_docker_spark.sources.files import read_jsonl_with_quarantine

    p = tmp_path / "j"
    p.mkdir()
    (p / "x.json").write_text('{"a": 1}\n{"a": 2\nnot json\n{"a": 3}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    clean, corrupt = read_jsonl_with_quarantine(spark, str(p), schema)
    assert corrupt.count() == 2
    assert sorted(r["a"] for r in clean.collect()) == [1, 3]


def test_items_windowed_as_of_semantics():
    """The windowed fake endpoint must never serve a version from after
    its window end (the property the incremental pipeline's correctness
    rests on): as-of 03-11, item 4 is its live v1 — the 03-13 deletion
    snapshot is invisible; as-of 03-13 the deletion wins."""
    from etl_docker_spark.sources.fake_api import fetch_items_windowed

    early = {r["Id"]: r for r in fetch_items_windowed(
        0, {"field": "created", "date_from": "2024-03-11",
            "date_to": "2024-03-11"})}
    assert early[4]["DeletionDatetime"] is None
    assert early[4]["Description"] == "delta v1"

    late = {r["Id"]: r for r in fetch_items_windowed(
        0, {"field": "created", "date_from": "2024-03-11",
            "date_to": "2024-03-13"})}
    assert late[4]["DeletionDatetime"] == "2024-03-13"

    # modified pull as-of 03-12 serves beta v2, not the future v3
    mod = {r["Id"]: r for r in fetch_items_windowed(
        0, {"field": "modified", "date_from": "2024-03-11",
            "date_to": "2024-03-12"})}
    assert mod[2]["Description"] == "beta v2"


def test_items_windowed_pagination_is_stable():
    """Pages partition the result set deterministically: concatenating
    pages equals the one-shot listing, no dup/drop across boundaries."""
    from etl_docker_spark.sources.fake_api import PAGE_SIZE, fetch_items_windowed

    params = {"field": "created", "date_from": "2024-03-10",
              "date_to": "2024-03-13"}
    pages, i = [], 0
    while True:
        batch = fetch_items_windowed(i, params)
        if not batch:
            break
        assert len(batch) <= PAGE_SIZE
        pages.extend(batch)
        i += 1
    ids = [r["Id"] for r in pages]
    assert ids == sorted(set(ids))  # no dup, no drop, stable order
