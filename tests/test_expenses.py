"""Expense-assignment pipeline tests (S7/P9/P12)."""

from __future__ import annotations

import pytest

from etl_docker_spark.pipelines.expenses import transform_expense_assignments
from etl_docker_spark.sources.excel import read_excel


def test_transform_drops_unassignable(spark):
    assignments = spark.createDataFrame(
        [(1, "01-DF CENTRAL"), (2, "99-NO EXISTE"), (3, "02-SUCURSAL B")],
        "CODIGO_GASTO int, Sucursal string")
    sucursales = spark.createDataFrame(
        [("01-DF CENTRAL", 1), ("02-SUCURSAL B", 2)],
        "DESCRIPCION_SUCURSAL string, CODIGO_SUCURSAL int")
    out = transform_expense_assignments(assignments, sucursales)
    assert out.columns == ["CODIGO_GASTO", "CODIGO_SUCURSAL"]
    rows = sorted((r.CODIGO_GASTO, r.CODIGO_SUCURSAL) for r in out.collect())
    assert rows == [(1, 1), (3, 2)]  # unknown branch dropped (dropna :356)


def test_excel_read_gated(spark, tmp_path):
    fake = tmp_path / "gastos.xlsx"
    fake.write_bytes(b"not really an xlsx")
    with pytest.raises((NotImplementedError, Exception)):
        read_excel(spark, str(fake), sheet_name="Gastos")
