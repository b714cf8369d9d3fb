"""Kafka source (reference A12, ``src/spark_pgsql/spark_streaming.py:32-50``).

The kafka-sql connector jar is not in this container; these wrappers
build the exact reader the reference uses and fail with a clear
message if the package is absent. Source parallelism = topic
partitions: the reference ran 1 partition ("no parallelism needed",
README:134-138) — at scale, partition the topic and Spark maps
partitions to tasks 1:1."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _kafka_reader(spark: SparkSession, stream: bool):
    return (spark.readStream if stream else spark.read).format("kafka")


def kafka_stream_options(
    brokers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The consumer option set, exactly the reference's
    (``src/spark_pgsql/spark_streaming.py:36-42``: bootstrap servers,
    subscribe, startingOffsets=earliest). Split out so the contract is
    golden-testable without broker jars."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming Kafka scan: (key, value binary, topic, partition,
    offset, timestamp, ...). Pair with
    ``pipelines.recall_ingest.parse_json_records`` for the JSON path."""
    return (
        _kafka_reader(spark, stream=True)
        .options(**kafka_stream_options(brokers, topic, starting_offsets))
        .load()
    )


def read_kafka_batch(
    spark: SparkSession, brokers: str, topic: str
) -> DataFrame:
    """Bounded (batch) read of a topic — for backfills/replays."""
    return (
        _kafka_reader(spark, stream=False)
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
