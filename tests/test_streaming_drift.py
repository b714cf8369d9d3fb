"""Windowed PSI drift monitor (streaming/drift.py): batch/streaming
parity and drift discrimination."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.streaming.drift import (
    freeze_reference,
    windowed_psi,
)

SCHEMA = "ts timestamp, v double"


def _rows(shift_hour2=0.0):
    # two hourly windows x 200 values; second window optionally
    # shifted (drift)
    rows = []
    for i in range(200):
        rows.append((f"2024-03-01 10:{i % 60:02d}:{i % 59:02d}", float(i % 50)))
    for i in range(200):
        rows.append(
            (
                f"2024-03-01 11:{i % 60:02d}:{(i * 7) % 59:02d}",
                float(i % 50) + shift_hour2,
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts string, v string").select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("v").cast("double").alias("v"),
    )


def test_windowed_psi_batch_streaming_parity(spark, tmp_path):
    rows = _rows(shift_hour2=30.0)
    batch = _df(spark, rows)
    ref = batch.filter(
        F.col("ts") < F.lit("2024-03-01 11:00:00").cast("timestamp")
    ).select("v")
    bounds, props = freeze_reference(ref, "v", n_bins=8)

    got_batch = sorted(
        (str(r["window_start"]), r["psi"], r["n"])
        for r in windowed_psi(
            batch, "ts", "v", bounds, props, window="1 hour"
        ).collect()
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for ts, v in rows:
            fh.write(json.dumps({"ts": ts, "v": v}) + "\n")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = windowed_psi(
        stream, "ts", "v", bounds, props, window="1 hour"
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("psi_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = sorted(
        (str(r["window_start"]), r["psi"], r["n"])
        for r in spark.sql("SELECT * FROM psi_stream").collect()
    )
    assert got_stream == got_batch  # bit-identical scores


def test_windowed_psi_discriminates_drift(spark):
    # no shift: both windows track the reference -> tiny PSI;
    # +30 shift in hour 2 -> large PSI there only
    for shift, hi_expected in ((0.0, False), (30.0, True)):
        batch = _df(spark, _rows(shift_hour2=shift))
        ref = batch.filter(
            F.col("ts") < F.lit("2024-03-01 11:00:00").cast("timestamp")
        ).select("v")
        bounds, props = freeze_reference(ref, "v", n_bins=8)
        psi = {
            str(r["window_start"]): r["psi"]
            for r in windowed_psi(
                batch, "ts", "v", bounds, props, window="1 hour"
            ).collect()
        }
        h1 = psi["2024-03-01 10:00:00"]
        h2 = psi["2024-03-01 11:00:00"]
        assert h1 < 0.1  # reference window is stable vs itself
        if hi_expected:
            assert h2 > 0.25  # conventional 'shifted' threshold
        else:
            assert h2 < 0.1


def test_windowed_psi_watermark_bounds_state(spark, tmp_path):
    """With a watermark + append mode, finalized windows emit and
    late state is bounded (the production monitor configuration)."""
    rows = _rows()
    src = tmp_path / "wm_src"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for ts, v in rows:
            fh.write(json.dumps({"ts": ts, "v": v}) + "\n")
    # a sentinel far in the future advances the watermark past both
    # real windows so append mode finalizes them in one drain
    with open(src / "b.json", "w") as fh:
        fh.write(json.dumps({"ts": "2024-03-02 00:00:00", "v": 1.0}) + "\n")
    batch = _df(spark, rows)
    ref = batch.select("v")
    bounds, props = freeze_reference(ref, "v", n_bins=8)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = windowed_psi(
        stream, "ts", "v", bounds, props,
        window="1 hour", watermark="30 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("psi_append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = {
        str(r["window_start"]): r["n"]
        for r in spark.sql("SELECT * FROM psi_append").collect()
    }
    assert emitted.get("2024-03-01 10:00:00") == 200
    assert emitted.get("2024-03-01 11:00:00") == 200


def test_windowed_js_bounded_and_parity(spark, tmp_path):
    """JS stays within [0, ln 2] even under total drift (where PSI
    explodes), and the streaming run matches batch bit-for-bit."""
    import math

    from pipeline_dataengineer_spark.streaming.drift import windowed_js

    rows = _rows(shift_hour2=1000.0)  # hour 2 fully out of support
    batch = _df(spark, rows)
    ref = batch.filter(
        F.col("ts") < F.lit("2024-03-01 11:00:00").cast("timestamp")
    ).select("v")
    bounds, props = freeze_reference(ref, "v", n_bins=8)
    got = {
        str(r["window_start"]): r["js_nats"]
        for r in windowed_js(
            batch, "ts", "v", bounds, props, window="1 hour"
        ).collect()
    }
    assert got["2024-03-01 10:00:00"] < 0.05
    h2 = got["2024-03-01 11:00:00"]
    # +1000 collapses hour 2 into the reference's TOP bin: one-hot p
    # vs ~uniform q gives JS ~= 0.5 nats — large but still bounded by
    # ln 2 (where PSI with its floored logs would explode to ~13)
    assert 0.4 < h2 <= math.log(2) + 1e-9
    # streaming parity
    src = tmp_path / "js_src"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for ts, v in rows:
            fh.write(json.dumps({"ts": ts, "v": v}) + "\n")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        windowed_js(stream, "ts", "v", bounds, props, window="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("js_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        str(r["window_start"]): r["js_nats"]
        for r in spark.sql("SELECT * FROM js_stream").collect()
    }
    assert got_stream == got


def test_windowed_ot_batch_streaming_parity_and_drift(spark, tmp_path):
    from pipeline_dataengineer_spark.streaming.drift import windowed_ot

    rows = _rows(shift_hour2=30.0)
    batch = _df(spark, rows)
    ref = batch.filter(
        F.col("ts") < F.lit("2024-03-01 11:00:00").cast("timestamp")
    ).select("v")
    bounds, props = freeze_reference(ref, "v", n_bins=8)

    got_batch = sorted(
        (str(r["window_start"]), r["sinkhorn_div"], r["n"])
        for r in windowed_ot(
            batch, "ts", "v", bounds, props, window="1 hour"
        ).collect()
    )
    # hour 1 tracks the reference (debiased ~0); hour 2 is shifted
    by_win = dict((w, d) for w, d, _ in got_batch)
    assert abs(by_win["2024-03-01 10:00:00"]) < 0.05
    assert by_win["2024-03-01 11:00:00"] > 0.3

    src = tmp_path / "ot_src"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for ts, v in rows:
            fh.write(json.dumps({"ts": ts, "v": v}) + "\n")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        windowed_ot(stream, "ts", "v", bounds, props, window="1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ot_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = sorted(
        (str(r["window_start"]), r["sinkhorn_div"], r["n"])
        for r in spark.sql("SELECT * FROM ot_stream").collect()
    )
    assert got_stream == got_batch  # bit-identical scores
