"""Delimited / JSON-lines file ingestion with bad-record quarantine.

The file-drop side of the reference's ingestion surface (its Excel intake,
SURVEY.md S7, generalized): land files arrive as CSV or JSONL, malformed
lines must not kill the load, and every rejected line must be recoverable
for replay — the file-scan twin of the row-level quarantine sink (K7).

Spark-first: PERMISSIVE mode parses good lines and captures each bad line
verbatim in the corrupt-record column IN THE SAME SCAN — one pass, no
pre-validation read. A Spark restriction shapes the API: any plan that prunes down to ONLY
the corrupt column is rejected
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and a
`corrupt.count()` does exactly that. The readers therefore MATERIALIZE
the parsed scan once (localCheckpoint) before splitting, which is also
the right production shape: parse-and-land the file once, then serve
clean/corrupt views off the landed result instead of re-scanning raw
text per consumer. Callers who want lazy single-consumer scans pass
materialize=False and must keep a real column in every downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already contains {CORRUPT_COL}")
    return schema.add(CORRUPT_COL, T.StringType())


def _split(full: DataFrame, materialize: bool) -> tuple[DataFrame, DataFrame]:
    if materialize:
        full = full.localCheckpoint()
    clean = full.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = full.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, corrupt


def read_jsonl_with_quarantine(
        spark: SparkSession, path: str, schema: T.StructType,
        materialize: bool = True) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan -> (clean, corrupt).

    clean: rows parsed against `schema` (corrupt column dropped).
    corrupt: one row per malformed line — raw line in _corrupt_record,
    schema columns NULL. Both frames come from ONE permissive scan,
    materialized once (see module docstring).
    """
    full = (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))
    return _split(full, materialize)


def read_csv_with_quarantine(
        spark: SparkSession, path: str, schema: T.StructType,
        header: bool = True, sep: str = ",",
        materialize: bool = True) -> tuple[DataFrame, DataFrame]:
    """CSV scan -> (clean, corrupt); same contract as the JSONL reader.

    A CSV line is corrupt when it fails type coercion or has the wrong
    column count (PERMISSIVE semantics)."""
    full = (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("header", str(header).lower())
            .option("sep", sep)
            .csv(path))
    return _split(full, materialize)
