"""pipeline_dataengineer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference ETL pipeline (``antonyper/Pipeline-DataEngineer``),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, Structured Streaming for streams, Pandas UDFs only where
built-ins genuinely cannot express the semantics.

Layout:
    session      tuned SparkSession factory (AQE, shuffle sizing, UTC)
    catalog      parquet table loader for the test datasets
    functions/   scalar/column function library (text, dates, vectors)
    operators/   relational + pipeline operators (dedup, joins, incremental)
    sources/     source connectors (files, JDBC helpers, paginated REST)
    sinks/       idempotent sinks (anti-join append, kafka/jdbc gated)
    streaming/   Structured Streaming wrappers (windows, dedup, foreachBatch)
    multimodal/  binary-column (image/audio/video) plumbing over mapInPandas
    contract/    the driver-facing query contract (queries + DuckDB oracles)
"""

__version__ = "0.1.0"
