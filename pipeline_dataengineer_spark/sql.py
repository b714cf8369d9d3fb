"""SQL entry point: run arbitrary Spark SQL over the catalog tables.

A user of the reference interacts through DataFrames/SQL in the
consumer (``spark.sql`` is the same Catalyst front door); this helper
makes the whole catalog queryable in one call."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipeline_dataengineer_spark.catalog import DEFAULT_SF_DIR, register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Register all catalog tables as temp views and run `query`.
    Views are lazy parquet scans — registration costs nothing until
    the query references a table."""
    register_views(spark, sf_dir or DEFAULT_SF_DIR)
    return spark.sql(query)
