"""LIVE end-to-end run of the reference's core dataflow, entirely
in-sandbox: producer-side transform → per-row JSON messages (the
Kafka payload op, with a file directory standing in for the topic) →
streaming consume → schema parse → last-wins dedup → idempotent
append through a REAL JDBC sink (embedded Derby).

This executes every stage the reference wires through Kafka+Postgres
(``src/kafka_client/kafka_stream_data.py:117-125`` producer,
``src/spark_pgsql/spark_streaming.py:53-92`` consumer/sink) with only
the broker transport swapped for files — the payload bytes, schema,
transforms, dedup, and sink semantics are the real ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.recall_ingest import (
    RECALL_COLUMNS,
    ingest_batch,
    parse_json_records,
    transform_recall_records,
)
from pipeline_dataengineer_spark.sinks.writers import (
    kafka_json_payload,
    write_jdbc_append,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
URL = "jdbc:derby:memory:recall_e2e;create=true"
TABLE = "rappel_conso"


def _raw_df(spark, rows):
    keys = sorted({k for r in rows for k in r})
    data = [tuple(r.get(k) for k in keys) for r in rows]
    schema = ", ".join(f"{k} string" for k in keys)
    return spark.createDataFrame(data, schema=schema)


def _raw_row(ref, pub, extra=None):
    row = {
        "reference_fiche": ref,
        "date_de_publication": pub,
        "categorie_de_produit": "Épicerie sucrée",
        "risques_encourus_par_le_consommateur": "Listeria",
        "date_debut_fin_de_commercialisation": "Du 01/02/2024 au 15/03/2024",
    }
    row.update(extra or {})
    return row


def _read_sink(spark):
    # pushDownPredicate off: Spark maps string→CLOB on Derby, and
    # Derby can't compare CLOB against a pushed-down string literal
    # (a Derby-only quirk; the reference's Postgres TEXT compares
    # fine). Filters evaluate Spark-side instead.
    return (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", TABLE)
        .option("driver", DERBY_DRIVER)
        .option("pushDownPredicate", "false")
        .load()
    )


def _run_stream(spark, src_dir, ckpt):
    stream = spark.readStream.text(str(src_dir))
    parsed = parse_json_records(stream, value_col="value")

    def sink(batch_df, epoch_id):
        existing = _read_sink(spark)
        ingest_batch(
            batch_df,
            existing,
            writer=lambda d: write_jdbc_append(
                d, URL, TABLE, driver=DERBY_DRIVER
            ),
        )

    q = (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_reference_dataflow_end_to_end_with_real_jdbc_sink(spark, tmp_path):
    # ---- producer side (the reference's kafka_client role) --------
    raw = _raw_df(
        spark,
        [
            _raw_row("F1", "2024-04-17", {"motif_du_rappel": "old"}),
            _raw_row("F1", "2024-04-18", {"motif_du_rappel": "new"}),
            _raw_row("F2", "2024-04-18"),
        ],
    )
    messages = kafka_json_payload(transform_recall_records(raw))
    topic_dir = tmp_path / "topic"
    messages.coalesce(1).write.mode("overwrite").text(str(topic_dir))

    # pre-create the sink table (the reference's create_table.py DDL
    # role) with the 25-column recall schema.
    empty = transform_recall_records(raw).limit(0)
    write_jdbc_append(empty, URL, TABLE, driver=DERBY_DRIVER)

    # ---- consumer side (spark_streaming.py) -----------------------
    _run_stream(spark, topic_dir, tmp_path / "ckpt1")
    got = {
        r["reference_fiche"]: r["motif_du_rappel"]
        for r in _read_sink(spark).collect()
    }
    # in-batch last-wins dedup kept F1's newest record; both keys landed
    assert got == {"F1": "new", "F2": None}
    # full 25-column schema round-tripped through JSON AND the database
    assert sorted(_read_sink(spark).columns) == sorted(RECALL_COLUMNS)
    # transform semantics survived serialization + the JDBC round-trip
    row = _read_sink(spark).filter(F.col("reference_fiche") == "F1").collect()[0]
    assert row["categorie_de_produit"] == "Epicerie sucree"
    assert row["date_debut_commercialisation"] == "01/02/2024"

    # ---- replay: same messages, fresh checkpoint ------------------
    # (an at-least-once redelivery) -> idempotent, nothing duplicated
    _run_stream(spark, topic_dir, tmp_path / "ckpt2")
    assert _read_sink(spark).count() == 2
