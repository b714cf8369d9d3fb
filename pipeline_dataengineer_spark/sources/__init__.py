"""Source connectors."""

from pipeline_dataengineer_spark.sources.files import (
    read_parquet,
    read_csv,
    read_json,
    read_orc,
)
from pipeline_dataengineer_spark.sources.rest import (
    RestPaginatedSource,
    register_rest_source,
)
from pipeline_dataengineer_spark.sources.jdbc import read_jdbc_partitioned
from pipeline_dataengineer_spark.sources.kafka import read_kafka_stream, read_kafka_batch

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "RestPaginatedSource",
    "register_rest_source",
    "read_jdbc_partitioned",
    "read_kafka_stream",
    "read_kafka_batch",
]
