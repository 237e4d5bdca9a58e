"""Oracle output-type hygiene — no Spark needed, runs in seconds.

Round-4 driver-gate regression (VERDICT r4): the driver's value hash is
TYPE-sensitive. DuckDB widens un-cast integer aggregates (SUM(BIGINT),
``//`` over widened operands) to HUGEINT, whose Arrow serialization
differs from BIGINT even when every value is equal — so 4 gate rows went
red (d21/g01/s14/s15) while the type-blind str() mirror said 189/189.

This sweep compiles every oracle against the smoke corpus and rejects any
output column that resolves to HUGEINT/UHUGEINT/DECIMAL. Convention: pin
integer outputs to BIGINT with a CAST at the final projection (HUGEINT
arithmetic INSIDE a CTE is fine — it is exact — only the surfaced type
matters).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE

_UNSAFE = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def duck():
    from etl_docker_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def test_no_hugeint_oracle_outputs(duck):
    import __spark_entry__ as entrymod

    offenders: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        hits = [
            f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
            if str(t) in _UNSAFE[:2] or str(t).startswith(_UNSAFE[2])
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracles emit driver-hash-unsafe output types (CAST the final "
        f"projection to BIGINT): {offenders}")


def test_mirror_rejects_hugeint(duck):
    """The checker itself must flag a widened type, not just this sweep."""
    rel = duck.sql("SELECT SUM(o_orderkey) AS s FROM orders")
    assert str(rel.types[0]) == "HUGEINT"  # DuckDB still widens un-cast SUM
