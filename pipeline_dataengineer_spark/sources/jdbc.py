"""JDBC source helpers.

The reference reads its whole Postgres table through a single JDBC
connection (``src/spark_pgsql/spark_streaming.py:73-75``) — one
partition, one executor doing all the work. At scale a JDBC read must
be range-partitioned so N executors each open a connection for a
key slice. No JDBC driver jar ships in this container, so the helper
builds the reader config; executing it requires the jar on the
classpath (documented, import-safe)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 16,
    **properties: str,
) -> DataFrame:
    """Range-partitioned JDBC scan: `num_partitions` concurrent
    connections, each reading
    ``partition_column ∈ [slice_lo, slice_hi)``. Catalyst pushes
    filters into each connection's WHERE clause."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
