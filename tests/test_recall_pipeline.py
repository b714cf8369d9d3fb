"""End-to-end fidelity test of the recall-ingest pipeline: JSON
ingest → schema → transform → dedup → idempotent append, mirroring
the reference dataflow (``spark_streaming.py:53-92``)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.recall_ingest import (
    RECALL_COLUMNS,
    ingest_batch,
    parse_json_records,
    transform_recall_records,
)


def _raw_df(spark, rows):
    """All-string schema (the reference's degenerate type system,
    SURVEY §1.2) — avoids inference failing on all-NULL columns."""
    keys = sorted({k for r in rows for k in r})
    data = [tuple(r.get(k) for k in keys) for r in rows]
    schema = ", ".join(f"{k} string" for k in keys)
    return spark.createDataFrame(data, schema=schema)


def _raw_row(ref, pub, extra=None):
    row = {
        "reference_fiche": ref,
        "date_de_publication": pub,
        "categorie_de_produit": "Épicerie sucrée",
        "distributeurs": "",
        "risques_encourus_par_le_consommateur": "Listeria",
        "description_complementaire_du_risque": "voir fiche",
        "preconisations_sanitaires": None,
        "recommandations_sante": "consulter un médecin",
        "date_debut_fin_de_commercialisation": "Du 01/02/2024 au 15/03/2024",
        "champ_inconnu": "dropped by schema",
    }
    row.update(extra or {})
    return row


def test_json_parse_drops_unknown_and_nulls_missing(spark):
    payloads = [json.dumps(_raw_row("F1", "2024-04-18"))]
    df = spark.createDataFrame([(p,) for p in payloads], ["value"])
    parsed = parse_json_records(df)
    assert parsed.columns == RECALL_COLUMNS
    row = parsed.collect()[0]
    assert row["reference_fiche"] == "F1"
    assert row["conditionnements"] is None  # missing → NULL


def test_transform_semantics(spark):
    df = _raw_df(spark, [_raw_row("F1", "2024-04-18")])
    out = transform_recall_records(df).collect()[0]
    assert out["categorie_de_produit"] == "Epicerie sucree"  # accent strip
    assert out["distributeurs"] is None  # empty → NULL
    assert out["risques_pour_le_consommateur"] == "Listeria\nvoir fiche"  # merge
    assert out["recommandations_sante"] == "consulter un medecin"  # one-side merge + strip
    assert out["date_debut_commercialisation"] == "01/02/2024"
    assert out["date_fin_commercialisation"] == "15/03/2024"


def test_ingest_dedup_and_idempotence(spark):
    batch = _raw_df(
        spark,
        [
            _raw_row("F1", "2024-04-17", {"motif_du_rappel": "old"}),
            _raw_row("F1", "2024-04-18", {"motif_du_rappel": "new"}),
            _raw_row("F2", "2024-04-18"),
        ],
    )
    batch = transform_recall_records(batch)
    empty = batch.limit(0)

    # last-wins within the batch (kafka_stream_data.py:78-79)
    first = ingest_batch(batch, empty)
    got = {r["reference_fiche"]: r["motif_du_rappel"] for r in first.collect()}
    assert got == {"F1": "new", "F2": None}

    # re-running the same batch against the now-populated sink → 0 rows
    rerun = ingest_batch(batch, first)
    assert rerun.count() == 0

    # partial overlap → only the new key lands
    batch2 = transform_recall_records(
        _raw_df(spark, [_raw_row("F2", "2024-04-19"), _raw_row("F3", "2024-04-19")])
    )
    second = ingest_batch(batch2, first)
    assert [r["reference_fiche"] for r in second.collect()] == ["F3"]
