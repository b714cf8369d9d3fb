"""Streaming deduplication.

The reference achieves at-least-once + dedup by overlapping its
watermark by one day and anti-joining the sink
(``src/kafka_client/kafka_stream_data.py:33-45``,
``src/spark_pgsql/spark_streaming.py:80-90``). The streaming-native
equivalent bounds the dedup state with a watermark instead of keeping
every key forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Drop duplicate keys on a stream.

    With `ts_col`: ``dropDuplicatesWithinWatermark`` — state for a key
    is released once the watermark passes it (bounded memory at any
    scale; duplicates arriving later than `watermark` are NOT caught,
    mirroring the reference's one-day overlap trade-off). Without:
    unbounded ``dropDuplicates`` (batch or short-lived streams only).
    """
    if ts_col is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
