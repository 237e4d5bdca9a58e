"""Schema-align projection (SURVEY.md P2).

The reference guarantees required columns exist even when the API omits them
(`reindex(columns=columnas_requeridas)`, CotyData_IPN.py:86-94). In Spark
that's schema-on-read: project to the declared StructType, adding absent
columns as typed NULLs and casting present ones. Column pruning still reaches
the scan because this is a plain `select`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project `df` onto `schema`: cast present columns, NULL-fill absent ones."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
