"""Connector contracts: a LIVE JDBC round-trip through embedded Derby
(the one JDBC engine whose driver ships inside Spark's own jars), and
golden tests pinning the Kafka option set / producer payload to the
reference's exact shapes (broker jars are absent in this container, so
the Kafka *network* path stays untested here — but everything up to
the format("kafka") boundary executes).

Reference: consumer options ``src/spark_pgsql/spark_streaming.py:36-42``,
producer loop ``src/kafka_client/kafka_stream_data.py:117-125``.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.sinks.writers import (
    kafka_json_payload,
    write_jdbc_append,
)
from pipeline_dataengineer_spark.sources.jdbc import read_jdbc_partitioned
from pipeline_dataengineer_spark.sources.kafka import kafka_stream_options

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_write_then_partitioned_read_roundtrip(spark):
    url = "jdbc:derby:memory:sparkgraft;create=true"
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("row_"), F.col("id")).alias("s"),
    )
    write_jdbc_append(df, url, "roundtrip", driver=DERBY_DRIVER)
    back = read_jdbc_partitioned(
        spark,
        url,
        "roundtrip",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    # The scan really is split into num_partitions concurrent slices —
    # each executor opens its own connection for a key range.
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    got = {r["k"]: (r["v"], r["s"]) for r in back.collect()}
    assert got[7] == (14.0, "row_7")
    assert got[999] == (1998.0, "row_999")


def test_jdbc_filter_pushdown_reaches_where_clause(spark):
    url = "jdbc:derby:memory:sparkgraft;create=true"
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    write_jdbc_append(df, url, "pushdown", driver=DERBY_DRIVER)
    back = read_jdbc_partitioned(
        spark, url, "pushdown",
        partition_column="k", lower_bound=0, upper_bound=100,
        num_partitions=2, driver=DERBY_DRIVER,
    ).filter(F.col("k") >= 90)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # Catalyst pushes the predicate into the JDBC source (it appears as
    # a PushedFilters entry, executed in each connection's WHERE).
    assert "PushedFilters" in plan and "k" in plan
    assert back.count() == 10


def test_kafka_consumer_options_match_reference(spark):
    # spark_streaming.py:36-42 — exactly these three options, with
    # startingOffsets defaulting to "earliest".
    opts = kafka_stream_options("kafka:9092", "rappel_conso")
    assert opts == {
        "kafka.bootstrap.servers": "kafka:9092",
        "subscribe": "rappel_conso",
        "startingOffsets": "earliest",
    }


def test_kafka_json_payload_matches_reference_producer(spark):
    # kafka_stream_data.py:117-125: each row becomes one message whose
    # value is json.dumps(row_dict). The payload DataFrame must carry a
    # single string `value` column whose content parses back to the row.
    df = spark.createDataFrame(
        [(1, "Épicerie", 3.5), (2, None, 0.25)],
        ["ref", "name", "score"],
    )
    payload = kafka_json_payload(df)
    assert [f.name for f in payload.schema.fields] == ["value"]
    assert payload.schema["value"].dataType.typeName() == "string"
    rows = [json.loads(r["value"]) for r in payload.collect()]
    assert {"ref": 1, "name": "Épicerie", "score": 3.5} in rows
    # to_json drops nulls by default — same as the reference's dict
    # rows, where missing fields are simply absent from the payload.
    assert {"ref": 2, "score": 0.25} in rows


def test_kafka_json_payload_keyed(spark):
    df = spark.createDataFrame([(10, "x")], ["ref", "name"])
    payload = kafka_json_payload(df, key_col="ref")
    row = payload.collect()[0]
    assert row["key"] == "10"
    assert json.loads(row["value"]) == {"ref": 10, "name": "x"}
