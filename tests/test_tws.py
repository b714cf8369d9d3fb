"""transformWithState (Spark 4 StatefulProcessor API): cross-batch
state on the RocksDB store, parity vs the applyInPandasWithState
backend."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

# The transformWithState driver worker speaks protobuf to the JVM
# state server; the library isn't in this image, so these tests are
# environment-gated the same way the Kafka-broker tests are. The
# operator module itself imports fine without it.
pytest.importorskip("google.protobuf")

from pipeline_dataengineer_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    running_totals_tws,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_tws_state_survives_across_batches(spark, tmp_path, rocksdb_state):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = spark.readStream.schema(SCHEMA).json(str(src))
        out = running_totals_tws(stream)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: (r["n"], r["total"]) for r in collected}

    _write(src, "b0.json", [
        {"user_id": 1, "value": 2.0},
        {"user_id": 1, "value": 3.0},
        {"user_id": 2, "value": 10.0},
    ])
    got = run()
    assert got[1] == (2, 5.0)
    assert got[2] == (1, 10.0)

    # second drain, same checkpoint: ValueState accumulates
    _write(src, "b1.json", [
        {"user_id": 1, "value": 5.0},
        {"user_id": 3, "value": 1.0},
    ])
    got = run()
    assert got[1] == (3, 10.0)
    assert got[3] == (1, 1.0)


def test_tws_matches_apply_in_pandas_backend(spark, tmp_path, rocksdb_state):
    """Both stateful backends fold the same batch to identical
    running totals."""
    from pipeline_dataengineer_spark.streaming.stateful import running_totals

    src = tmp_path / "src2"
    src.mkdir()
    rows = [{"user_id": i % 3, "value": float(i)} for i in range(30)]
    _write(src, "b0.json", rows)

    results = {}
    for label, op, ckpt in (
        ("tws", running_totals_tws, str(tmp_path / "c1")),
        ("apip", running_totals, str(tmp_path / "c2")),
    ):
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            op(stream)
            .writeStream.outputMode("update")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        results[label] = {r["user_id"]: (r["n"], r["total"]) for r in collected}
    assert results["tws"] == results["apip"]
