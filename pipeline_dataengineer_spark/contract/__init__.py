"""Driver-facing query contract: named Spark queries + DuckDB oracles."""

from pipeline_dataengineer_spark.contract.queries import QUERIES, flagship
from pipeline_dataengineer_spark.contract.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES", "flagship"]
