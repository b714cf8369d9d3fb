"""Sink connectors."""

from pipeline_dataengineer_spark.sinks.writers import (
    write_parquet,
    write_kafka_json,
    write_jdbc_append,
)

__all__ = ["write_parquet", "write_kafka_json", "write_jdbc_append"]
