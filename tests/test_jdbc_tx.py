"""Staged-commit exactly-once JDBC publishing (sinks/jdbc_tx.py)
against live embedded Derby: publish, retry no-op, mid-protocol crash
recovery, and the streaming adapter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.sinks.jdbc_tx import (
    LEDGER_TABLE,
    staged_foreach_batch,
    staged_jdbc_append,
)

URL = "jdbc:derby:memory:txdb;create=true"


def _count(spark, table):
    return (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", table)
        .load()
        .count()
    )


@pytest.fixture()
def target(spark):
    from pipeline_dataengineer_spark.sinks.ddl import execute_ddl

    name = "tx_target"
    try:
        execute_ddl(spark, URL, f"DROP TABLE {name}")
    except Exception:
        pass
    try:
        execute_ddl(spark, URL, f"DROP TABLE {LEDGER_TABLE}")
    except Exception:
        pass
    execute_ddl(spark, URL, f"CREATE TABLE {name} (id BIGINT, v VARCHAR(20))")
    return name


def test_staged_append_publishes_once(spark, target):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out1 = staged_jdbc_append(df, URL, target, batch_id=7)
    assert out1["published"] is True
    assert _count(spark, target) == 2
    # redelivered epoch: exact no-op, rows not doubled
    out2 = staged_jdbc_append(df, URL, target, batch_id=7)
    assert out2["published"] is False
    assert _count(spark, target) == 2
    # next epoch appends
    staged_jdbc_append(df, URL, target, batch_id=8)
    assert _count(spark, target) == 4


def test_staged_append_orphan_staging_recovery(spark, target):
    """Crash between commit and staging drop: the staging table
    survives, but the ledger row makes the retry a no-op that also
    cleans the orphan."""
    from pipeline_dataengineer_spark.sinks.ddl import execute_ddl
    from pipeline_dataengineer_spark.sinks.jdbc_tx import _table_exists

    df = spark.createDataFrame([(5, "x")], "id long, v string")
    staged_jdbc_append(df, URL, target, batch_id=1)
    # simulate the orphan: recreate the staging table post-commit
    staging = f"stg_{target}_1"
    execute_ddl(spark, URL, f"CREATE TABLE {staging} (id BIGINT, v VARCHAR(20))")
    out = staged_jdbc_append(df, URL, target, batch_id=1)
    assert out["published"] is False
    assert _count(spark, target) == 1
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    try:
        assert not _table_exists(conn, staging)  # orphan cleaned
    finally:
        conn.close()


def test_staged_append_rolls_back_on_publish_failure(spark, target):
    """A publish that dies inside the transaction leaves NOTHING:
    no target rows, no ledger row — the retry can run cleanly."""
    df = spark.createDataFrame([(1, "toolongvalue_xxxxxxxxxxxxxxxxx")],
                               "id long, v string")
    # v exceeds VARCHAR(20): Spark writes staging as CLOB fine, but
    # INSERT..SELECT into the VARCHAR(20) target fails mid-transaction
    with pytest.raises(Exception):
        staged_jdbc_append(df, URL, target, batch_id=3)
    assert _count(spark, target) == 0
    ok = spark.createDataFrame([(1, "short")], "id long, v string")
    out = staged_jdbc_append(ok, URL, target, batch_id=3)
    assert out["published"] is True
    assert _count(spark, target) == 1


def test_staged_foreach_batch_streaming(spark, tmp_path, target):
    import json

    src = tmp_path / "txsrc"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"id": i, "v": f"r{i}"}) + "\n")
    stream = (
        spark.readStream.schema("id long, v string").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(staged_foreach_batch(URL, target))
        .option("checkpointLocation", str(tmp_path / "txckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert _count(spark, target) == 3
    # replay the SAME epochs from a fresh checkpoint: ledger blocks
    # the duplicate publish
    q2 = (
        stream.writeStream.foreachBatch(staged_foreach_batch(URL, target))
        .option("checkpointLocation", str(tmp_path / "txckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    assert _count(spark, target) == 3


def test_staged_append_rejects_unsafe_identifiers(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        staged_jdbc_append(df, URL, 'tx; DROP TABLE x--', batch_id=1)
    with pytest.raises(ValueError, match="unsafe SQL identifier"):
        staged_jdbc_append(
            df, URL, "tx_target", batch_id=1, columns=['v"; DELETE']
        )


def test_staged_append_passes_connection_properties(spark, target):
    # driver-side ledger/publish connections must honor the SAME
    # properties the Spark writer gets (user/password/driver); Derby
    # embedded accepts arbitrary user props, so this proves the props
    # path executes end-to-end (round 3 used the bare-URL overload)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    out = staged_jdbc_append(
        df, URL, target, batch_id=41,
        user="app", password="secret",
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )
    assert out["published"] is True
    assert _count(spark, target) == 1
