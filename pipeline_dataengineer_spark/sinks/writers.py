"""Sinks: parquet (tested), Kafka JSON + JDBC append (reference
parity; jars absent in this container, wrappers are import-safe).

The reference's producer serializes one JSON message per row in a
Python loop (``src/kafka_client/kafka_stream_data.py:117-125``); the
Spark-native shape is ``to_json(struct(*)) → format("kafka")`` — the
serialization happens JVM-side, distributed, batched by the Kafka
producer per partition."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. `partition_by` low-cardinality columns only —
    date/hour/lang, never a key — or the file count explodes."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def kafka_json_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """The exact DataFrame a Kafka sink serializes: optional string
    ``key`` plus a ``value`` column holding each row as one JSON
    object — the distributed equivalent of the reference producer's
    per-row ``json.dumps(row)`` loop
    (``src/kafka_client/kafka_stream_data.py:117-125``). Split out
    from the sink so the payload shape is testable without broker
    jars."""
    return df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def write_kafka_json(df: DataFrame, brokers: str, topic: str, key_col: str | None = None) -> None:
    """Every row → one JSON message (reference A11, distributed)."""
    (
        kafka_json_payload(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )


def write_jdbc_append(
    df: DataFrame, url: str, table: str, batchsize: int = 10_000, **properties: str
) -> None:
    """JDBC append (reference A18). One connection per partition;
    `batchsize` controls rows per INSERT round-trip — repartition the
    DataFrame to bound concurrent connections."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
