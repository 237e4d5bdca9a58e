"""etl_docker_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL (lucaschero7/etl-docker, surveyed in SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, broadcast
dimension joins, merge-based sinks, and scale-oriented partitioning — plus the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
    catalog     synthetic-table loaders / temp-view registration
    functions/  scalar column-expression library (SURVEY §2.8 F1-F24)
    operators/  pure DataFrame->DataFrame relational operators (§2.3-2.7)
    sources/    paginated REST source, JDBC wrappers (§2.1)
    sinks/      writers: append/overwrite/merge/quarantine/audit (§2.2)
    pipelines/  the reference's ETL pipelines rebuilt on Spark (§3)
    plans/      the declared query surface (drives __spark_entry__)
    llm/        dedup / similarity / text-analysis / multimodal operators
    streaming/  Structured Streaming operators (windows, sessionization, CDC)
"""

__version__ = "0.1.0"
