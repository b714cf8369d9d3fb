"""Robust statistics operators: winsorization / percentile clipping.

Outlier handling for feature columns before training: clip values to
the [lower_q, upper_q] percentile band, optionally per group. Bounds
are computed with EXACT interpolated percentiles (same definition as
DuckDB ``quantile_cont``, so the whole operator oracle-checks), then
attached with a broadcast join — the bounds table has one row per
group, so the fact side never shuffles. At 100 TB swap
``F.percentile`` for ``approx_percentile`` (t-digest sketch, no
sort-by-group memory) and keep the identical join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` into its [lower_q, upper_q] percentile band
    (per group when ``group_cols`` given). Adds ``out_col`` (default
    ``<value_col>_w``); original column is preserved."""
    out = out_col or f"{value_col}_w"
    lo = F.percentile(value_col, F.lit(lower_q)).alias("__lo")
    hi = F.percentile(value_col, F.lit(upper_q)).alias("__hi")
    if group_cols:
        bounds = df.groupBy(*group_cols).agg(lo, hi)
        joined = df.join(F.broadcast(bounds), group_cols)
    else:
        bounds = df.agg(lo, hi)
        joined = df.join(F.broadcast(bounds))
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(out, clipped).drop("__lo", "__hi")
