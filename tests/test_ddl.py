"""A20 DDL executed LIVE against embedded Derby: table creation, PK
enforcement as backstop, and the engine's anti-join idempotence
keeping the PK from ever firing on the normal path."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError

from pipeline_dataengineer_spark.pipelines.recall_ingest import RECALL_COLUMNS
from pipeline_dataengineer_spark.sinks.ddl import (
    build_create_table_sql,
    create_recall_table,
)
from pipeline_dataengineer_spark.sinks.writers import write_jdbc_append

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
URL = "jdbc:derby:memory:ddl_test;create=true"


def test_ddl_text_matches_reference_shape():
    sql = build_create_table_sql(
        "rappel_conso_table", RECALL_COLUMNS, primary_key=RECALL_COLUMNS[0]
    )
    # scripts/create_table.py:32-41 — first field is the PK, all text
    assert sql.startswith("CREATE TABLE rappel_conso_table")
    assert "reference_fiche TEXT PRIMARY KEY" in sql
    assert sql.count("TEXT") == len(RECALL_COLUMNS)


def test_pk_not_in_fields_raises():
    with pytest.raises(ValueError, match="primary_key"):
        build_create_table_sql("t", ["a", "b"], primary_key="c")


def test_live_table_with_pk_backstop(spark):
    # Derby: CLOB payload (matches Spark's string setNull jdbc type),
    # VARCHAR key (Derby forbids a PK on CLOB). Postgres = all TEXT.
    create_recall_table(
        spark, URL, driver=DRIVER, text_type="CLOB", key_type="VARCHAR(255)"
    )
    row = {c: None for c in RECALL_COLUMNS}
    row["reference_fiche"] = "F1"
    df = spark.createDataFrame(
        [tuple(row[c] for c in RECALL_COLUMNS)],
        ", ".join(f"{c} string" for c in RECALL_COLUMNS),
    )
    write_jdbc_append(df, URL, "rappel_conso_table", driver=DRIVER)
    got = (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", "rappel_conso_table")
        .option("driver", DRIVER)
        .load()
    )
    assert got.count() == 1
    # the PRIMARY KEY is live: a raw duplicate append violates it
    with pytest.raises(Py4JJavaError):
        write_jdbc_append(df, URL, "rappel_conso_table", driver=DRIVER)
    # ... but the engine's idempotent path anti-joins it away first,
    # so the constraint never fires in normal operation
    from pipeline_dataengineer_spark.operators.incremental import idempotent_append

    idempotent_append(
        df,
        got,
        keys=["reference_fiche"],
        writer=lambda d: write_jdbc_append(
            d, URL, "rappel_conso_table", driver=DRIVER
        ),
    )
    assert got.count() == 1
