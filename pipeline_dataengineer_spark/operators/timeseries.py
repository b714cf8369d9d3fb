"""Time-series resampling: per-group date spines and gap filling.

Event/order streams have holes (days with no rows); downstream
rollups, moving averages, and charting need a dense axis. The dense
axis is generated *distributed*: per-group bounds via one aggregate,
then ``sequence()`` + ``explode()`` (rows are produced executor-side
from each group's min/max — no driver-side range materialization, so
a 10-year × 10M-group spine never touches the driver). The reference
has no time-series ops; generalizes its daily-batch cadence
(SURVEY.md §3.1) into a queryable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_spine(df: DataFrame, date_col: str, group_cols: list[str]) -> DataFrame:
    """One row per (group, day) covering each group's [min, max] date
    range. Input ``date_col`` must already be DateType."""
    bounds = df.groupBy(*group_cols).agg(
        F.min(date_col).alias("_mn"), F.max(date_col).alias("_mx")
    )
    return bounds.select(
        *group_cols,
        F.explode(F.sequence("_mn", "_mx", F.expr("INTERVAL 1 DAY"))).alias(date_col),
    )


def resample_daily(
    df: DataFrame,
    date_col: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Daily aggregate per group with gaps filled: aggregate first
    (shrinks the fact table to one row per group-day BEFORE the spine
    join — at scale the join touches the aggregate, never the raw
    rows), then left-join onto the dense spine and coalesce fills."""
    agged = (
        df.withColumn(date_col, F.col(date_col).cast("date"))
        .groupBy(*group_cols, date_col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    spine = date_spine(agged, date_col, group_cols)
    joined = spine.join(agged, on=[*group_cols, date_col], how="left")
    fill = fill or {}
    out_cols = [*group_cols, date_col]
    for name in aggs:
        c = F.col(name)
        if name in fill:
            c = F.coalesce(c, F.lit(fill[name]))
        out_cols.append(c.alias(name))
    return joined.select(*out_cols)
