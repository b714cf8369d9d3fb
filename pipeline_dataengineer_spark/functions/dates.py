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


def date_dimension(spark, start: str, end: str):
    """Calendar dimension table for [start, end] inclusive: one row
    per day with the standard warehouse attributes (ISO week/year,
    quarter, day-of-week, month boundaries, weekend flag). Generated
    from ONE sequence expression — no driver loop, no data source;
    at any span the table is date-cardinality-sized and broadcastable
    against fact tables."""
    from pyspark.sql import functions as F

    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )
    dow = F.dayofweek("date")  # 1=Sunday .. 7=Saturday
    return days.select(
        "date",
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        F.month("date").alias("month"),
        F.dayofmonth("date").alias("day_of_month"),
        F.weekofyear("date").alias("iso_week"),
        F.expr("extract(YEAROFWEEK FROM date)").alias("iso_year"),
        dow.alias("day_of_week"),
        F.date_format("date", "EEEE").alias("day_name"),
        F.trunc("date", "month").alias("month_start"),
        F.last_day("date").alias("month_end"),
        dow.isin(1, 7).alias("is_weekend"),
    )


def _busdays_before(d: Column) -> Column:
    """Business days (Mon-Fri) in [1969-12-29 (a Monday), d) — pure
    integer arithmetic: 5 per full week + min(partial-week days, 5)."""
    n = F.unix_date(d.cast("date")) + F.lit(3)  # 0 ↔ Monday 1969-12-29
    return F.lit(5) * F.floor(n / 7) + F.least(F.pmod(n, F.lit(7)), F.lit(5))


def network_days(start: Column | str, end: Column | str) -> Column:
    """Count of business days (Mon–Fri, no holiday calendar) in the
    INCLUSIVE range [start, end] — the spreadsheet NETWORKDAYS
    convention for SLA / lead-time analytics. Negative when
    end < start (reversed range, sign carries the direction), 0 only
    for weekend-only ranges. Pure closed-form integer arithmetic on
    days-since-epoch — one fused codegen projection, exactly
    replayable in any engine (no loops, no calendars)."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    fwd = _busdays_before(F.date_add(e.cast("date"), 1)) - _busdays_before(s)
    rev = _busdays_before(F.date_add(s.cast("date"), 1)) - _busdays_before(e)
    return (
        F.when(e >= s, fwd).otherwise(-rev).cast("long")
    )
