"""Structured Streaming tests: file-source micro-batches through the
windows/dedup/idempotent-sink wrappers, driven synchronously with
availableNow + awaitTermination."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_dataengineer_spark.streaming.dedup import streaming_dedup
from pipeline_dataengineer_spark.streaming.sinks import (
    idempotent_foreach_batch,
    run_available_now,
)
from pipeline_dataengineer_spark.streaming.windows import tumbling_window_agg

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _write_json(tmp_path, name, rows):
    p = tmp_path / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(tmp_path)


def test_streaming_tumbling_window(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_json(
        src,
        "batch0.json",
        [
            {"k": "a", "ts": "2024-01-01T00:10:00", "v": 1.0},
            {"k": "a", "ts": "2024-01-01T00:50:00", "v": 2.0},
            {"k": "a", "ts": "2024-01-01T01:10:00", "v": 5.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", [F.sum("v").alias("sv")], group_cols=["k"]
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["window"]["start"].hour: r["sv"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert got == {0: 3.0, 1: 5.0}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_json(
        src,
        "batch0.json",
        [
            {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "a", "ts": "2024-01-01T00:05:00", "v": 2.0},
            {"k": "b", "ts": "2024-01-01T00:06:00", "v": 3.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    deduped = streaming_dedup(stream, ["k"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT k FROM dedup_out").collect()
    assert sorted(r["k"] for r in rows) == ["a", "b"]


def test_idempotent_foreach_batch_sink(spark, tmp_path):
    """The reference's daily drain (foreachBatch + anti-join + append),
    run twice over overlapping input → second run appends nothing new."""
    src = tmp_path / "src"
    src.mkdir()
    sink_dir = str(tmp_path / "sink")
    _write_json(
        src,
        "batch0.json",
        [
            {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "b", "ts": "2024-01-01T00:01:00", "v": 2.0},
        ],
    )

    def get_existing():
        try:
            return spark.read.parquet(sink_dir)
        except Exception:
            return spark.createDataFrame([], SCHEMA)

    def writer(df):
        df.write.mode("append").parquet(sink_dir)

    def run(ckpt):
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        fb = idempotent_foreach_batch(get_existing, ["k"], writer, order_col="ts")
        q = run_available_now(stream, fb, str(tmp_path / ckpt))
        q.awaitTermination(60)

    run("ck1")
    assert spark.read.parquet(sink_dir).count() == 2

    # overlapping re-delivery (fresh checkpoint = reprocess everything)
    _write_json(
        src,
        "batch1.json",
        [
            {"k": "b", "ts": "2024-01-01T00:02:00", "v": 9.0},  # dup key
            {"k": "c", "ts": "2024-01-01T00:03:00", "v": 3.0},  # new
        ],
    )
    run("ck2")
    got = {r["k"] for r in spark.read.parquet(sink_dir).collect()}
    assert got == {"a", "b", "c"}
    assert spark.read.parquet(sink_dir).count() == 3  # no duplicate b


def test_stream_static_join_enriches(spark, tmp_path):
    from pipeline_dataengineer_spark.streaming.joins import stream_static_join

    src = tmp_path / "src_enrich"
    src.mkdir()
    _write_json(
        src,
        "batch0.json",
        [
            {"k": "a", "ts": "2024-01-01T00:10:00", "v": 1.0},
            {"k": "b", "ts": "2024-01-01T00:20:00", "v": 2.0},
            {"k": "zz", "ts": "2024-01-01T00:30:00", "v": 3.0},
        ],
    )
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["k", "name"])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    joined = stream_static_join(stream, dim, ["k"])
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {(r["k"], r["name"]) for r in spark.sql("select * from enrich_out").collect()}
    assert rows == {("a", "alpha"), ("b", "beta")}


def test_stream_stream_interval_join(spark, tmp_path):
    from pipeline_dataengineer_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    left_dir = tmp_path / "src_left"
    right_dir = tmp_path / "src_right"
    left_dir.mkdir()
    right_dir.mkdir()
    _write_json(
        left_dir,
        "batch0.json",
        [
            {"k": "u1", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "u2", "ts": "2024-01-01T02:00:00", "v": 2.0},
        ],
    )
    _write_json(
        right_dir,
        "batch0.json",
        [
            # 10 min after u1's left event -> inside [0, 30m]
            {"k": "u1", "ts": "2024-01-01T00:10:00", "v": 10.0},
            # 90 min after -> outside
            {"k": "u1", "ts": "2024-01-01T01:30:00", "v": 20.0},
            # different key
            {"k": "u3", "ts": "2024-01-01T02:00:00", "v": 30.0},
        ],
    )
    left = spark.readStream.schema(SCHEMA).json(str(left_dir)).select(
        F.col("k"), F.col("ts").alias("lts"), F.col("v").alias("lv")
    )
    right = spark.readStream.schema(SCHEMA).json(str(right_dir)).select(
        F.col("k"), F.col("ts").alias("rts"), F.col("v").alias("rv")
    )
    joined = stream_stream_interval_join(
        left, right, "k", "lts", "rts", lower="0 seconds", upper="30 minutes"
    ).select(F.col("l.k").alias("k"), "lv", "rv")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {(r["k"], r["lv"], r["rv"]) for r in spark.sql("select * from ssj_out").collect()}
    assert rows == {("u1", 1.0, 10.0)}


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched left row may only
    emit (with null right columns) once the watermark proves no match
    can still arrive — Structured Streaming's outer-join contract.
    Drain 1: no output for the unmatched row. Drain 2 (later events
    advance the watermark past the join bound): the null row appears."""
    from pipeline_dataengineer_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    left_dir = tmp_path / "lo_left"
    right_dir = tmp_path / "lo_right"
    left_dir.mkdir()
    right_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_lo")

    def drain(name):
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        left = spark.readStream.schema(SCHEMA).json(str(left_dir)).select(
            F.col("k"), F.col("ts").alias("lts"), F.col("v").alias("lv")
        )
        right = spark.readStream.schema(SCHEMA).json(str(right_dir)).select(
            F.col("k"), F.col("ts").alias("rts"), F.col("v").alias("rv")
        )
        joined = stream_stream_interval_join(
            left, right, "k", "lts", "rts",
            lower="0 seconds", upper="10 minutes",
            watermark="5 minutes", how="left_outer",
        ).select(F.col("l.k").alias("k"), "lv", "rv")
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["k"], r["lv"], r["rv"]) for r in collected}

    _write_json(left_dir, "b0.json", [
        {"k": "u1", "ts": "2024-01-01T00:00:00", "v": 1.0},   # will match
        {"k": "u2", "ts": "2024-01-01T00:00:00", "v": 2.0},   # never matches
    ])
    _write_json(right_dir, "b0.json", [
        {"k": "u1", "ts": "2024-01-01T00:05:00", "v": 10.0},
    ])
    got1 = drain("d1")
    # matched row may emit immediately; the unmatched one must NOT yet
    assert ("u1", 1.0, 10.0) in got1
    assert not any(k == "u2" for k, _, _ in got1)

    # advance event time well past u2's bound on BOTH sides (each
    # stream's watermark is the min over inputs)
    _write_json(left_dir, "b1.json", [
        {"k": "u9", "ts": "2024-01-01T03:00:00", "v": 9.0},
    ])
    _write_json(right_dir, "b1.json", [
        {"k": "u8", "ts": "2024-01-01T03:00:00", "v": 8.0},
    ])
    got2 = drain("d2")
    assert ("u2", 2.0, None) in got2


def test_progress_ledger_captures_batch_metrics(spark, tmp_path):
    import json as _json
    import time as _time

    from pipeline_dataengineer_spark.streaming.monitoring import ProgressLedger

    spool = str(tmp_path / "progress.jsonl")
    ledger = ProgressLedger(path=spool)
    spark.streams.addListener(ledger)
    try:
        src = tmp_path / "mon_src"
        src.mkdir()
        _write_json(src, "b0.json", [
            {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "b", "ts": "2024-01-01T00:01:00", "v": 2.0},
        ])
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "mon_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener events are delivered async on the event bus
        for _ in range(50):
            if ledger.total_input_rows() >= 2 and any(
                r["event"] == "terminated" for r in ledger.records
            ):
                break
            _time.sleep(0.2)
        assert ledger.total_input_rows() == 2
        kinds = {r["event"] for r in ledger.records}
        assert {"started", "progress", "terminated"} <= kinds
        spooled = [_json.loads(l) for l in open(spool) if l.strip()]
        assert len(spooled) == len(ledger.records)
    finally:
        spark.streams.removeListener(ledger)


def test_stream_stream_full_outer_emits_both_sides_after_watermark(spark, tmp_path):
    """FULL OUTER stream-stream join: unmatched rows from BOTH sides
    may only emit (nulls opposite) once the watermark proves no match
    can still arrive. Drain 1: only the matched pair. Drain 2 (event
    time advanced far past the bound on both inputs): the left-null
    AND right-null rows appear."""
    from pipeline_dataengineer_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    left_dir = tmp_path / "fo_left"
    right_dir = tmp_path / "fo_right"
    left_dir.mkdir()
    right_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_fo")

    def drain():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        left = spark.readStream.schema(SCHEMA).json(str(left_dir)).select(
            F.col("k"), F.col("ts").alias("lts"), F.col("v").alias("lv")
        )
        right = spark.readStream.schema(SCHEMA).json(str(right_dir)).select(
            F.col("k"), F.col("ts").alias("rts"), F.col("v").alias("rv")
        )
        joined = stream_stream_interval_join(
            left, right, "k", "lts", "rts",
            lower="0 seconds", upper="10 minutes",
            watermark="5 minutes", how="full_outer",
        ).select(
            F.coalesce(F.col("l.k"), F.col("r.k")).alias("k"), "lv", "rv"
        )
        q = (
            joined.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["k"], r["lv"], r["rv"]) for r in collected}

    _write_json(left_dir, "b0.json", [
        {"k": "u1", "ts": "2024-01-01T00:00:00", "v": 1.0},   # will match
        {"k": "u2", "ts": "2024-01-01T00:00:00", "v": 2.0},   # left-only
    ])
    _write_json(right_dir, "b0.json", [
        {"k": "u1", "ts": "2024-01-01T00:05:00", "v": 10.0},
        {"k": "u7", "ts": "2024-01-01T00:05:00", "v": 70.0},  # right-only
    ])
    got1 = drain()
    assert ("u1", 1.0, 10.0) in got1
    # neither unmatched side may emit before the watermark closes
    assert not any(k in ("u2", "u7") for k, _, _ in got1)

    _write_json(left_dir, "b1.json", [
        {"k": "u9", "ts": "2024-01-01T03:00:00", "v": 9.0},
    ])
    _write_json(right_dir, "b1.json", [
        {"k": "u8", "ts": "2024-01-01T03:00:00", "v": 8.0},
    ])
    got2 = drain()
    assert ("u2", 2.0, None) in got2   # left-null row
    assert ("u7", None, 70.0) in got2  # right-null row


def test_stream_stream_left_semi_join(spark, tmp_path):
    """LEFT SEMI stream-stream join: matched left rows emit ONCE (even
    with several in-window right matches) with no right columns;
    unmatched left rows never emit."""
    from pipeline_dataengineer_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    left_dir = tmp_path / "src_left"
    right_dir = tmp_path / "src_right"
    left_dir.mkdir()
    right_dir.mkdir()
    _write_json(
        left_dir,
        "batch0.json",
        [
            {"k": "u1", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "u2", "ts": "2024-01-01T02:00:00", "v": 2.0},
        ],
    )
    _write_json(
        right_dir,
        "batch0.json",
        [
            # TWO in-window matches for u1 -> still one semi row
            {"k": "u1", "ts": "2024-01-01T00:10:00", "v": 10.0},
            {"k": "u1", "ts": "2024-01-01T00:20:00", "v": 11.0},
            # out-of-window for u2
            {"k": "u2", "ts": "2024-01-01T03:30:00", "v": 20.0},
        ],
    )
    left = spark.readStream.schema(SCHEMA).json(str(left_dir)).select(
        F.col("k"), F.col("ts").alias("lts"), F.col("v").alias("lv")
    )
    right = spark.readStream.schema(SCHEMA).json(str(right_dir)).select(
        F.col("k"), F.col("ts").alias("rts"), F.col("v").alias("rv")
    )
    joined = stream_stream_interval_join(
        left, right, "k", "lts", "rts",
        lower="0 seconds", upper="30 minutes", how="left_semi",
    )
    assert set(joined.columns) == {"k", "lts", "lv"}  # left columns only
    q = (
        joined.select("k", "lv").writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_semi_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_semi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = [
        (r["k"], r["lv"])
        for r in spark.sql("select * from ssj_semi_out").collect()
    ]
    assert rows == [("u1", 1.0)]  # once, despite two matches


def test_streaming_session_window_dynamic_gap(spark, tmp_path):
    from pipeline_dataengineer_spark.streaming.windows import session_window_agg

    src = tmp_path / "dsrc"
    src.mkdir()
    # k=a uses gap 600s (v<10), k=b gap 60s (v>=10): identical spacing
    # of 300s sessionizes into ONE session for a, THREE for b
    _write_json(
        src,
        "b0.json",
        [
            {"k": "a", "ts": "2024-01-01T00:00:00", "v": 1.0},
            {"k": "a", "ts": "2024-01-01T00:05:00", "v": 1.0},
            {"k": "a", "ts": "2024-01-01T00:10:00", "v": 1.0},
            {"k": "b", "ts": "2024-01-01T00:00:00", "v": 10.0},
            {"k": "b", "ts": "2024-01-01T00:05:00", "v": 10.0},
            {"k": "b", "ts": "2024-01-01T00:10:00", "v": 10.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    gap = F.when(F.col("v") < 10, F.lit("600 seconds")).otherwise(
        F.lit("60 seconds")
    )
    agg = session_window_agg(
        stream, "ts", gap, [F.count("*").alias("n")], group_cols=["k"]
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dyn_sess_out")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM dyn_sess_out").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["k"], []).append(r["n"])
    assert per_key["a"] == [3]
    assert sorted(per_key["b"]) == [1, 1, 1]


def test_stream_stream_anti_join_emits_after_watermark(spark, tmp_path):
    """Derived stream-stream ANTI join: unmatched-left rows appear
    exactly once, and only after the watermark closes their interval;
    matched rows never appear."""
    from pipeline_dataengineer_spark.streaming.joins import (
        stream_stream_interval_anti_join,
    )

    left_dir = tmp_path / "anti_left"
    right_dir = tmp_path / "anti_right"
    left_dir.mkdir()
    right_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_anti")

    def drain():
        collected = []

        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        left = spark.readStream.schema(SCHEMA).json(str(left_dir)).select(
            F.col("k"), F.col("ts").alias("lts"), F.col("v").alias("lv")
        )
        right = spark.readStream.schema(SCHEMA).json(str(right_dir)).select(
            F.col("k"), F.col("ts").alias("rts"), F.col("v").alias("rv")
        )
        anti = stream_stream_interval_anti_join(
            left, right, "k", "lts", "rts",
            lower="0 seconds", upper="10 minutes", watermark="5 minutes",
        )
        q = (
            anti.writeStream.outputMode("append")
            .foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["k"], r["lv"]) for r in collected}

    _write_json(left_dir, "b0.json", [
        {"k": "m", "ts": "2024-01-01T00:00:00", "v": 1.0},   # matched
        {"k": "u", "ts": "2024-01-01T00:00:00", "v": 2.0},   # unmatched
    ])
    _write_json(right_dir, "b0.json", [
        {"k": "m", "ts": "2024-01-01T00:03:00", "v": 10.0},
    ])
    got1 = drain()
    assert got1 == set()  # nothing provable yet; matched never emits

    _write_json(left_dir, "b1.json", [
        {"k": "zz", "ts": "2024-01-01T03:00:00", "v": 9.0},
    ])
    _write_json(right_dir, "b1.json", [
        {"k": "zz2", "ts": "2024-01-01T03:00:00", "v": 8.0},
    ])
    got2 = drain()
    assert got2 == {("u", 2.0)}  # only the unmatched left row, once
