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


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
    consistency: float = 1.4826,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Robust outlier flagging by median absolute deviation: a row is
    an outlier when ``|x - median| > k * consistency * MAD`` (the
    1.4826 consistency constant makes MAD estimate sigma under
    normality, so k plays the role of "k sigmas" without the mean and
    stddev being dragged by the outliers themselves).

    Two group-sized aggregates (median, then MAD of the residuals),
    each broadcast-joined back — the fact table never shuffles, same
    shape as winsorize. Exact interpolated ``F.percentile`` matches
    DuckDB ``quantile_cont`` for the oracle; at 100 TB swap in
    ``approx_percentile`` with the join shape unchanged.

    Degenerate groups: all-constant values give MAD == 0 and flag
    nothing (0 > 0 is false); a majority-constant group flags every
    value off the median, which is the intended reading of a
    zero-spread distribution."""
    med = F.percentile(value_col, F.lit(0.5)).alias("__med")
    if group_cols:
        meds = df.groupBy(*group_cols).agg(med)
        with_med = df.join(F.broadcast(meds), group_cols)
    else:
        with_med = df.join(F.broadcast(df.agg(med)))
    dev = F.abs(F.col(value_col) - F.col("__med"))
    mad = F.percentile(dev, F.lit(0.5)).alias("__mad")
    if group_cols:
        mads = with_med.groupBy(*group_cols).agg(mad)
        j = with_med.join(F.broadcast(mads), group_cols)
    else:
        j = with_med.join(F.broadcast(with_med.agg(mad)))
    flag = dev > F.lit(k) * F.lit(consistency) * F.col("__mad")
    return j.withColumn(flag_col, flag).drop("__med", "__mad")


def quantile_bucketize(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (quantile) binning — the ML-feature staple:
    bucket i collects values in (q_i, q_{i+1}]. Boundaries are exact
    interpolated percentiles at 1/n .. (n-1)/n computed in one
    group-sized aggregate and broadcast back; the bucket id is
    ``sum(value > boundary_i)`` — a fixed fan of comparisons, no
    window, no sort of the fact table (same shape as winsorize;
    swap approx_percentile in at 100 TB). Deterministic and
    SQL-portable, unlike ntile, whose tie-breaking is row-order
    dependent."""
    out = out_col or f"{value_col}_bucket"
    qs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [
        F.percentile(value_col, F.lit(q)).alias(f"__qb_{i}")
        for i, q in enumerate(qs)
    ]
    if group_cols:
        bounds = df.groupBy(*group_cols).agg(*aggs)
        joined = df.join(F.broadcast(bounds), group_cols)
    else:
        joined = df.join(F.broadcast(df.agg(*aggs)))
    bucket = F.lit(0)
    for i in range(len(qs)):
        bucket = bucket + F.when(
            F.col(value_col) > F.col(f"__qb_{i}"), 1
        ).otherwise(0)
    return joined.withColumn(out, bucket.cast("long")).drop(
        *[f"__qb_{i}" for i in range(len(qs))]
    )
