"""Streaming trending top-k (streaming/trending.py): windowed counts
fold into a durable snapshot via merge-on-read upserts; a second
drain re-emitting grown windows converges instead of double-counting."""

import json

from pipeline_dataengineer_spark.streaming.trending import (
    read_trending,
    trending_sink,
)

SCHEMA = "item string, ts timestamp"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, src, root, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        trending_sink(stream, root, "ts", "item", window="1 hour")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_trending_topk_two_drains(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "trend")
    ckpt = tmp_path / "ckpt"
    _write(
        src,
        "b0.json",
        [
            {"item": "x", "ts": "2024-01-01T00:05:00"},
            {"item": "x", "ts": "2024-01-01T00:15:00"},
            {"item": "y", "ts": "2024-01-01T00:20:00"},
            {"item": "z", "ts": "2024-01-01T01:10:00"},
        ],
    )
    _drain(spark, src, root, ckpt)
    got = {
        (r["window_start"], r["item"]): (r["cnt"], r["rank"])
        for r in read_trending(spark, root, k=2).collect()
    }
    assert got[("2024-01-01 00:00:00", "x")] == (2, 1)
    assert got[("2024-01-01 00:00:00", "y")] == (1, 2)
    assert got[("2024-01-01 01:00:00", "z")] == (1, 1)

    # second batch: hour-0 window grows (x again, y twice -> tie at 3?
    # no: x becomes 3, y becomes 3 -> tie breaks to 'x' lexically)
    _write(
        src,
        "b1.json",
        [
            {"item": "x", "ts": "2024-01-01T00:40:00"},
            {"item": "y", "ts": "2024-01-01T00:41:00"},
            {"item": "y", "ts": "2024-01-01T00:42:00"},
        ],
    )
    _drain(spark, src, root, ckpt)
    got = {
        (r["window_start"], r["item"]): (r["cnt"], r["rank"])
        for r in read_trending(spark, root, k=2).collect()
    }
    # upsert semantics: grown windows REPLACED their counts (3 each),
    # not doubled
    assert got[("2024-01-01 00:00:00", "x")] == (3, 1)
    assert got[("2024-01-01 00:00:00", "y")] == (3, 2)
    assert got[("2024-01-01 01:00:00", "z")] == (1, 1)
