"""JDBC source/sink wrappers (SURVEY.md S5, K1).

The reference reads dimensions with SQL text over SQLAlchemy
(Conectores_BD.py:124-131) and appends with chunked `to_sql`
(Conectores_BD.py:105-113). Spark equivalents are thin config around the
built-in JDBC relation; no driver jars ship in this environment, so these are
untested pass-throughs kept at the edge of the engine.

Scale notes baked into the defaults:
- reads partition on a numeric column (`partitionColumn`/bounds) so a fact
  pull is parallel, not a single-connection scan;
- writes use `batchsize` (replacing the reference's ⌊2100/ncols⌋ chunk math,
  utils.py:40-46) and `numPartitions` to bound connection count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_query(spark: SparkSession, url: str, query: str,
               properties: dict[str, str] | None = None,
               partition_column: str | None = None,
               lower_bound: int | None = None, upper_bound: int | None = None,
               num_partitions: int = 8) -> DataFrame:
    """S5: SQL-text scan. With bounds, a parallel partitioned read."""
    reader = (spark.read.format("jdbc").option("url", url).option("query", query))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()


def write_append(df: DataFrame, url: str, table: str,
                 properties: dict[str, str] | None = None,
                 batchsize: int = 1000, num_partitions: int = 8) -> None:
    """K1: batched append (the reference caps chunks at 1000 rows too)."""
    (df.coalesce(num_partitions)
       .write.format("jdbc").mode("append")
       .option("url", url).option("dbtable", table)
       .option("batchsize", str(batchsize))
       .options(**(properties or {}))
       .save())


def execute_statement(url: str, sql: str,
                      properties: dict[str, str] | None = None) -> None:
    """K10: driver-side DDL / stored-procedure execution (EXEC name).

    The reference calls SINCRONIZACION_* / STAGING_TABLE_* procedures
    around each load (Conectores_BD.py:114-123). Spark's JDBC relation
    cannot issue statements, so this goes through a raw java.sql connection
    on the driver (no jars in this container — gated)."""
    try:
        from py4j.java_gateway import java_import
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession")
        jvm = spark._jvm
        java_import(jvm, "java.sql.DriverManager")
        props = jvm.java.util.Properties()
        for k, v in (properties or {}).items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            stmt = conn.createStatement()
            stmt.execute(sql)
            stmt.close()
        finally:
            conn.close()
    except Exception as exc:
        raise NotImplementedError(
            f"JDBC statement execution needs a driver jar for {url!r} on the "
            "classpath (none ship in this container)") from exc


def staged_merge(df: DataFrame, url: str, staging_table: str, merge_sql: str,
                 properties: dict[str, str] | None = None,
                 batchsize: int = 1000) -> None:
    """K2: the reference's staging-table -> server-side merge idiom.

    1. overwrite the staging table with the batch (bulk append path);
    2. run ONE server-side MERGE statement (the SINCRONIZACION_* contract:
       final table reflects latest state by PK, triggers fire once).
    `merge_sql` is the explicit MERGE text — the reference's stored-proc
    bodies are not in its repo, so the observable upsert-by-PK contract is
    what we re-specify (SURVEY.md §7.3)."""
    (df.write.format("jdbc").mode("overwrite")
       .option("url", url).option("dbtable", staging_table)
       .option("truncate", "true").option("batchsize", str(batchsize))
       .options(**(properties or {}))
       .save())
    execute_statement(url, merge_sql, properties)
