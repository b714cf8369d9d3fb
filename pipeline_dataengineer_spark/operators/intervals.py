"""Interval algebra per key — the gaps-and-islands family: merge
overlapping spans, find the gaps between them, measure coverage.
Downtime stitching, on-call coverage, session repair, sensor uptime.

All relational: one window shuffle on the key (start-ordered running
maximum of the reach), then combinable aggregates — the island id is
a running sum over the same partitioning, so no second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_islands(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    touch_merges: bool,
) -> DataFrame:
    """One weighted row per distinct (keys, start, end) with its
    island id. Duplicates are pre-aggregated FIRST: island numbering
    is a running sum over a window order, and a running sum over a
    NON-total order is ill-defined — rows tied with the flag-carrying
    row can sort before it in a second window pass and split into a
    phantom island (observed cross-engine at sf0.1). After the
    pre-aggregation (s, e) is a total order per key, and the window
    input shrinks to the distinct-span count as a bonus."""
    distinct_spans = df.groupBy(*key_cols, start_col, end_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    reach = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    cmp = (
        F.col(start_col) > reach
        if touch_merges
        else F.col(start_col) >= reach
    )
    new_island = F.when(reach.isNull() | cmp, 1).otherwise(0)
    return distinct_spans.withColumn(
        "__island", F.sum(new_island).over(w)
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    touch_merges: bool = True,
) -> DataFrame:
    """Coalesce overlapping intervals per key into maximal islands:
    (keys..., start, end, n_merged). ``touch_merges`` controls
    whether back-to-back spans (next.start == prev.end) join (the
    default — half-open [start, end) semantics) or stay separate.

    Works for numeric and timestamp columns alike (only ordering and
    max are used)."""
    isl = _with_islands(df, key_cols, start_col, end_col, touch_merges)
    return isl.groupBy(*key_cols, "__island").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.sum("__n").alias("n_merged"),
    ).drop("__island")


def interval_gaps(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """The complement of merge_intervals: per key, the open gaps
    BETWEEN coalesced islands as (keys..., gap_start, gap_end) —
    downtime between uptime spans, silence between sessions. Keys
    with a single island emit nothing."""
    merged = merge_intervals(df, key_cols, start_col, end_col)
    w = Window.partitionBy(*key_cols).orderBy(start_col)
    prev_end = F.lag(F.col(end_col)).over(w)
    return (
        merged.select(
            *key_cols,
            prev_end.alias("gap_start"),
            F.col(start_col).alias("gap_end"),
        )
        .filter(F.col("gap_start").isNotNull())
    )


def coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per key: number of islands, total covered length, and the span
    [first start, last end] — uptime ratio numerators. Length
    arithmetic requires a numeric or timestamp column (timestamps
    diff to seconds via unix casts by the caller if needed); here the
    covered amount is summed as (end - start) per island, which Spark
    defines for numerics and for timestamps (interval), so we emit
    the numeric form: callers cast timestamps up front."""
    merged = merge_intervals(df, key_cols, start_col, end_col)
    return merged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col(end_col) - F.col(start_col)).alias("covered"),
        F.min(start_col).alias("span_start"),
        F.max(end_col).alias("span_end"),
    )
