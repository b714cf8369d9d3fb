"""Date/time helpers.

Re-expresses the reference's watermark arithmetic
(``src/kafka_client/kafka_stream_data.py:33-45``): after a batch,
state becomes ``max(date) - 1 day`` so the next strict-``>`` read
deliberately overlaps one day (at-least-once + downstream dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def max_date_minus(col: Column | str, days: int = 1, fmt: str = "yyyy-MM-dd") -> Column:
    """``date_format(date_sub(max(to_date(col)), days), fmt)`` —
    the reference's A10 aggregate (``kafka_stream_data.py:38-43``)
    as a single JVM aggregate expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.date_sub(F.max(F.to_date(c, fmt)), days), fmt)


def high_water_mark(df: DataFrame, col: str, overlap_days: int = 1) -> str | None:
    """Compute the new incremental high-water mark for a batch.

    Distributed max (partial agg map-side, single value to driver) —
    the only driver-side materialization is one scalar, which is the
    correct shape at any scale. Returns None on an empty batch (state
    unchanged, mirroring ``kafka_stream_data.py:36-37``).
    """
    row = df.agg(max_date_minus(col, overlap_days).alias("hwm")).collect()[0]
    return row["hwm"]
