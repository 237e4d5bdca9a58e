"""Excel source (SURVEY.md S7).

The reference reads small expense workbooks with pandas
(Funciones_CotyData.py:347-356). Excel files are driver-sized by nature;
pandas -> createDataFrame is the right path (openpyxl is not in this
container, so the read is gated behind an import-try)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_excel(spark: SparkSession, path: str, sheet_name: str | int = 0,
               usecols: str | list[str] | None = None,
               schema: T.StructType | None = None) -> DataFrame:
    try:
        import pandas as pd
        pdf = pd.read_excel(path, sheet_name=sheet_name, usecols=usecols)
    except ImportError as exc:  # openpyxl missing in this environment
        raise NotImplementedError(
            "Excel read requires openpyxl; not available in this container"
        ) from exc
    return (spark.createDataFrame(pdf, schema=schema) if schema
            else spark.createDataFrame(pdf))
