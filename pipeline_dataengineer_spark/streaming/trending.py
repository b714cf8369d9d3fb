"""Streaming trending-items: windowed counts folded into a durable
per-window top-k table — the "what's hot right now" pipeline
(trending hashtags / hot products / surging queries).

Composition of pieces the engine already proves separately:
tumbling event-time windows with a watermark (streaming/windows.py)
→ foreachBatch folding each window's item counts into a SNAPSHOT
table keyed by (window, item) via merge-on-read upserts
(operators/snapshots.py) → a reader that finalizes top-k per window
on the dimension-sized counts table.

Scale/semantics notes:

- the stream side aggregates BEFORE anything durable: each
  micro-batch ships only (window, item, partial count) rows, never
  events;
- update-mode emission means a window's count row is re-emitted as
  it grows; the upsert (last-writer-wins per (window, item)) makes
  re-delivery and retries converge instead of double-counting —
  counts are full aggregates per emission, not deltas;
- top-k is computed at READ time from the counts table (a
  window-sized rank), so k is a query knob, not baked into state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.snapshots import (
    current_version,
    read_snapshot,
    upsert_append,
    write_snapshot,
)
from pipeline_dataengineer_spark.streaming.windows import (
    tumbling_window_agg,
)


def trending_sink(
    stream: DataFrame,
    root: str,
    ts_col: str,
    item_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Wire a streaming DataFrame of events into the durable trending
    counts table at ``root``. Returns the DataStreamWriter (caller
    picks trigger/checkpoint and starts it)."""
    counts = tumbling_window_agg(
        stream,
        ts_col,
        window,
        [F.count(F.lit(1)).alias("cnt")],
        group_cols=[item_col],
        watermark=watermark,
    ).select(
        F.col("window.start").cast("string").alias("window_start"),
        F.col(item_col).alias("item"),
        F.col("cnt"),
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        snap = batch_df.select("window_start", "item", "cnt")
        if current_version(root) is None:
            write_snapshot(snap.limit(0), root)
        upsert_append(spark, root, snap, keys=["window_start", "item"])

    return counts.writeStream.outputMode("update").foreachBatch(fold)


def read_trending(
    spark: SparkSession, root: str, k: int = 3
) -> DataFrame:
    """Top-k items per window from the durable counts table —
    (window_start, item, cnt, rank). Rank runs over the
    dimension-sized counts, ties break to the lexically-smaller item
    for determinism."""
    counts = read_snapshot(spark, root)
    w = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
