"""applyInPandasWithState: per-key state carried ACROSS micro-batches
(two sequential availableNow runs sharing one checkpoint)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from pipeline_dataengineer_spark.streaming.stateful import running_totals

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


def test_state_survives_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run(qname):
        # memory sink can't recover from a checkpoint → collect via
        # foreachBatch (also the realistic sink shape)
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = spark.readStream.schema(SCHEMA).json(str(src))
        out = running_totals(stream)
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: (r["n"], r["total"]) for r in collected}

    _write(src, "b0.json", [{"user_id": 1, "value": 2.0}, {"user_id": 1, "value": 3.0}, {"user_id": 2, "value": 10.0}])
    got = run("state_out1")
    assert got[1] == (2, 5.0)
    assert got[2] == (1, 10.0)

    # second drain, same checkpoint: state accumulates
    _write(src, "b1.json", [{"user_id": 1, "value": 5.0}, {"user_id": 3, "value": 1.0}])
    got = run("state_out2")
    assert got[1] == (3, 10.0)  # carried state: 2+1 events, 5+5 total
    assert got[3] == (1, 1.0)


def test_partitioned_sink_round_trip(spark, tmp_path):
    """Partitioned parquet sink + partition-pruned read-back — the
    write side of the scale posture (sinks/writers.py)."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.sinks.writers import write_parquet

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
    )
    out = str(tmp_path / "part_out")
    write_parquet(df, out, mode="overwrite", partition_by=["bucket"])

    back = spark.read.parquet(out).filter(F.col("bucket") == "2")
    assert back.count() == 250
    # partition pruning: the physical scan must carry a PartitionFilters
    # entry for bucket (not a post-scan filter)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_gap_sessions_close_on_gap_and_timeout(spark, tmp_path):
    from pipeline_dataengineer_spark.streaming.stateful import gap_sessions

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "src_sess"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_sess")

    def run():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = (
            spark.readStream.schema(schema)
            .json(str(src))
            .withWatermark("ts", "10 minutes")
        )
        out = gap_sessions(stream, "user_id", "ts", gap="30 minutes")
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    # batch 0: u1 has two events 10 min apart (one session), then an
    # event 2 hours later -> the first session closes in-batch
    _write(src, "b0.json", [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:10:00"},
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},
    ])
    got = run()
    assert len(got) == 1
    s = got[0]
    assert s["user_id"] == 1 and s["n_events"] == 2
    assert s["session_start"].minute == 0 and s["session_end"].minute == 10

    # batch 1: only u2 events far in the future -> watermark passes
    # u1's open-session timeout, closing it via EventTimeTimeout
    _write(src, "b1.json", [
        {"user_id": 2, "ts": "2024-01-01T06:00:00"},
        {"user_id": 2, "ts": "2024-01-01T06:01:00"},
    ])
    got = run()
    u1_closed = [r for r in got if r["user_id"] == 1]
    assert len(u1_closed) == 1 and u1_closed[0]["n_events"] == 1


def test_gap_sessions_null_ts_only_batch_for_new_key(spark, tmp_path):
    """A micro-batch delivering ONLY null timestamps for a brand-new
    key must not crash the state UDF (previously: AttributeError on
    None.timestamp()) and must not create state for that key."""
    from pipeline_dataengineer_spark.streaming.stateful import gap_sessions

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "src_nullts"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_nullts")

    def run():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = (
            spark.readStream.schema(schema)
            .json(str(src))
            .withWatermark("ts", "10 minutes")
        )
        out = gap_sessions(stream, "user_id", "ts", gap="30 minutes")
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    # u9 arrives with only a null ts; u1 provides valid events so the
    # batch itself is non-trivial.
    _write(src, "b0.json", [
        {"user_id": 9, "ts": None},
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},
    ])
    got = run()  # must not raise
    # u1's first event closed by the in-batch 2h gap; u9 never appears.
    assert [r["user_id"] for r in got] == [1]


def test_duration_ms_units():
    import pytest

    from pipeline_dataengineer_spark.streaming.stateful import _duration_ms

    assert _duration_ms("30 minutes") == 1_800_000
    assert _duration_ms("1 day") == 86_400_000
    assert _duration_ms("2 weeks") == 1_209_600_000
    with pytest.raises(ValueError, match="unsupported duration"):
        _duration_ms("3 fortnights")
    with pytest.raises(ValueError, match="unsupported duration"):
        _duration_ms("nonsense")


def test_gap_sessions_stream_matches_batch_sessionize(spark, tmp_path):
    """The stateful streaming sessionizer and the batch gaps-and-
    islands plan must produce identical CLOSED sessions."""
    from pipeline_dataengineer_spark.operators.events import sessionize
    from pipeline_dataengineer_spark.streaming.stateful import gap_sessions

    events = [
        {"user_id": 1, "ts": "2024-01-01T00:00:00"},
        {"user_id": 1, "ts": "2024-01-01T00:20:00"},
        {"user_id": 1, "ts": "2024-01-01T02:00:00"},
        {"user_id": 1, "ts": "2024-01-01T02:10:00"},
        {"user_id": 2, "ts": "2024-01-01T01:00:00"},
        # late sentinel events push the watermark far past every
        # session's timeout so ALL sessions close in the stream
        {"user_id": 9, "ts": "2024-02-01T00:00:00"},
        {"user_id": 1, "ts": "2024-02-02T00:00:00"},
        {"user_id": 2, "ts": "2024-02-02T00:00:00"},
        {"user_id": 9, "ts": "2024-02-03T00:00:00"},
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "src_parity"
    src.mkdir()
    # two batches so sessions also survive a checkpoint hop
    _write(src, "b0.json", events[:5])
    _write(src, "b1.json", events[5:])
    collected = []

    def collect(batch_df, epoch_id):
        collected.extend(batch_df.collect())

    q = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withWatermark("ts", "1 minute")
        .transform(lambda d: gap_sessions(d, "user_id", "ts", gap="30 minutes"))
        .writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ckpt_parity"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in collected
    }
    batch_df = spark.createDataFrame(
        [(e["user_id"], e["ts"]) for e in events], ["user_id", "ts_s"]
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    batch_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, "user_id", "ts", 1800).collect()
    }
    # every batch session whose end precedes the final watermark must
    # have been emitted by the stream; sentinel tail sessions may stay
    # open, so compare on the closed subset
    closed_batch = {
        s for s in batch_sessions if s[2].year == 2024 and s[2].month == 1
    }
    assert closed_batch <= stream_sessions
    assert all(s in batch_sessions for s in stream_sessions)


def test_rate_limit_token_bucket_across_batches(spark, tmp_path):
    """rate_limit: burst admits up to capacity, excess throttled;
    refill unlocks later events; bucket state carries across drains
    through the checkpoint."""
    from pipeline_dataengineer_spark.streaming.stateful import rate_limit

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        stream = spark.readStream.schema(schema).json(str(src))
        out = rate_limit(stream, capacity=3, refill_per_sec=1.0)
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    # burst of 5 at t=0..0.1s: 3 admitted, 2 throttled; then one at
    # t=2s: ~2 tokens refilled -> admitted
    base = "2024-01-01T00:00:0"
    _write(
        src,
        "b0.json",
        [{"user_id": 1, "ts": f"{base}0.0{i:02d}"} for i in range(5)]
        + [{"user_id": 1, "ts": "2024-01-01T00:00:02.000"}]
        + [{"user_id": 2, "ts": f"{base}0.000"}],
    )
    rows = run()
    u1 = sorted(
        (r for r in rows if r["user_id"] == 1), key=lambda r: r["ts"]
    )
    assert [r["admitted"] for r in u1] == [True, True, True, False, False, True]
    assert [r["admitted"] for r in rows if r["user_id"] == 2] == [True]

    # second drain, same checkpoint: after the t=2s admit the carried
    # bucket holds ~1.0 token (refills accrued during the burst);
    # +0.2s refill admits one event, the next 0.1s later is throttled;
    # a NULL timestamp is throttled outright
    _write(
        src,
        "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01T00:00:02.200"},
            {"user_id": 1, "ts": "2024-01-01T00:00:02.300"},
            {"user_id": 1, "ts": None},
        ],
    )
    rows = run()
    u1 = [r for r in rows if r["user_id"] == 1]
    admitted = [r["admitted"] for r in u1 if r["ts"] is not None]
    assert admitted == [True, False]
    assert [r["admitted"] for r in u1 if r["ts"] is None] == [False]


def test_streaming_ewma_matches_batch_across_drains(spark, tmp_path):
    """streaming_ewma over two checkpointed drains equals the batch
    ewma over the concatenated data — state carries the recursion."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.timeseries import ewma
    from pipeline_dataengineer_spark.streaming.stateful import (
        streaming_ewma,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def run():
        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        q = (
            streaming_ewma(spark.readStream.schema(schema).json(str(src)))
            .writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b0 = [{"user_id": 1, "ts": f"2024-01-01T00:00:0{i}", "value": float(10 * i)}
          for i in range(3)]
    b1 = [{"user_id": 1, "ts": f"2024-01-01T00:01:0{i}", "value": float(5 * i)}
          for i in range(3)]
    _write(src, "b0.json", b0)
    run()
    _write(src, "b1.json", b1)
    run()

    batch = spark.createDataFrame(
        [(1, r["ts"], r["value"]) for r in b0 + b1],
        "user_id long, ts string, value double",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    want = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma(batch, ["user_id"], "ts", "value").collect()
    }
    got = {(r["user_id"], r["ts"]): r["ewma"] for r in collected}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_rate_limit_replay_matches_streaming(spark, tmp_path):
    """The batch token-bucket replay and the streaming rate limiter
    agree decision-for-decision over the same (single-drain) data."""
    from pipeline_dataengineer_spark.operators.incremental import (
        rate_limit_replay,
    )
    from pipeline_dataengineer_spark.streaming.stateful import rate_limit

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    rows = (
        [{"user_id": 1, "ts": f"2024-01-01T00:00:0{i}.00{i}"} for i in range(5)]
        + [{"user_id": 1, "ts": "2024-01-01T00:00:09.500"}]
        + [{"user_id": 2, "ts": "2024-01-01T00:00:01"}]
    )
    _write(src, "b0.json", rows)

    collected = []

    def collect(batch_df, epoch_id):
        collected.extend(batch_df.collect())

    q = (
        rate_limit(
            spark.readStream.schema(schema).json(str(src)),
            capacity=3, refill_per_sec=0.5,
        )
        .writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in rows], "user_id long, ts string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"))
    replay = rate_limit_replay(
        batch, ["user_id"], "ts", capacity=3, refill_per_sec=0.5
    ).collect()

    skey = {(r["user_id"], r["ts"]): (r["admitted"], r["tokens_left"])
            for r in collected}
    bkey = {(r["user_id"], r["ts"]): (r["admitted"], r["tokens_left"])
            for r in replay}
    assert skey == bkey and len(skey) == len(rows)


def test_streaming_page_hinkley_matches_batch_across_drains(
    spark, tmp_path
):
    """streaming_page_hinkley over two checkpointed drains is
    bit-identical (quantize=6) to the batch page_hinkley over the
    concatenated data — five scalars of state carry the monitor."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.timeseries import (
        page_hinkley,
    )
    from pipeline_dataengineer_spark.streaming.stateful import (
        streaming_page_hinkley,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def run():
        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        q = (
            streaming_page_hinkley(
                spark.readStream.schema(schema).json(str(src)),
                delta=0.01,
                threshold=5.0,
                quantize=6,
            )
            .writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # a mean shift mid-stream so the alarm actually fires
    vals = [1.0, 1.2, 0.9, 1.1, 1.0, 0.95] + [9.0, 9.5, 9.2, 9.1]
    b0 = [
        {"user_id": 7, "ts": f"2024-01-01T00:00:{i:02d}", "value": v}
        for i, v in enumerate(vals[:6])
    ]
    b1 = [
        {"user_id": 7, "ts": f"2024-01-01T00:01:{i:02d}", "value": v}
        for i, v in enumerate(vals[6:])
    ]
    _write(src, "b0.json", b0)
    run()
    _write(src, "b1.json", b1)
    run()

    batch = spark.createDataFrame(
        [(7, r["ts"], r["value"]) for r in b0 + b1],
        "user_id long, ts string, value double",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
    want = {
        r["ts"]: (r["ph_inc"], r["ph_dec"], r["alarm"])
        for r in page_hinkley(
            batch, ["user_id"], "ts", "value",
            delta=0.01, threshold=5.0, quantize=6,
        ).collect()
    }
    got = {
        r["ts"]: (r["ph_inc"], r["ph_dec"], r["alarm"])
        for r in collected
    }
    assert got == want
    assert any(a for _, _, a in got.values())  # the shift alarms
