"""Master-detail flattening (SURVEY.md F22).

The reference splits each sales document into header + Items[] + Payments[]
with a Python loop over records (CotyData_IPN.py:251-275). Here the nested
DataFrame IS the master table; children are derived views via `explode` —
fully parallel, no driver loop, parent keys carried alongside.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_children(df: DataFrame, array_col: str,
                     parent_cols: Sequence[str] = (),
                     keep_empty: bool = False) -> DataFrame:
    """Flatten `array_col` (array<struct>) into one row per child element.

    Child struct fields become top-level columns; `parent_cols` are carried
    through (the parent-key columns). `keep_empty=True` uses explode_outer so
    parents with no children survive as a NULL child row.
    """
    ex = F.explode_outer if keep_empty else F.explode
    child = "__child"
    out = df.select(*parent_cols, ex(F.col(array_col)).alias(child))
    field_names = [f.name for f in out.schema[child].dataType.fields]
    return out.select(*parent_cols,
                      *[F.col(f"{child}.{n}").alias(n) for n in field_names])
