"""Per-group feature scaling for ML preprocessing — z-score, min-max,
and robust (median/IQR) normalization.

The naive formulation is a window aggregate over every fact row
(``avg(x) OVER (PARTITION BY g)``), which shuffles the full fact
table AND buffers each group in one task. Instead: compute the group
statistics as a plain combinable aggregate (group-sized output), join
them back broadcast-style, and scale in a fused codegen projection —
the fact table is never shuffled, the same aggregate-then-broadcast
shape as winsorize/mad_outliers (operators/robust.py).

No reference counterpart (SURVEY.md §2); north-star extension for
feature pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scale_features(
    df: DataFrame,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    method: str = "zscore",
    out_suffix: str = "_scaled",
) -> DataFrame:
    """Append ``<col><out_suffix>`` for each value column.

    method='zscore':  (x - mean) / stddev_samp   (NULL if stddev 0/NULL)
    method='minmax':  (x - min) / (max - min)    (NULL if max == min)

    Group stats are one map-side-combinable aggregation; the join back
    is on the (small) group key — broadcast by the optimizer when the
    group count allows, never a window over facts.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown method {method!r}")
    groups = list(group_cols or [])
    aggs = []
    for c in value_cols:
        if method == "zscore":
            aggs += [
                F.avg(c).alias(f"__mu_{c}"),
                F.stddev_samp(c).alias(f"__sd_{c}"),
            ]
        else:
            aggs += [
                F.min(c).alias(f"__lo_{c}"),
                F.max(c).alias(f"__hi_{c}"),
            ]
    if groups:
        stats = df.groupBy(*groups).agg(*aggs)
        joined = df.join(F.broadcast(stats), groups, "left")
    else:
        stats = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(stats))
    out = joined
    for c in value_cols:
        if method == "zscore":
            expr = F.when(
                F.col(f"__sd_{c}") > 0,
                (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"),
            )
        else:
            expr = F.when(
                F.col(f"__hi_{c}") != F.col(f"__lo_{c}"),
                (F.col(c) - F.col(f"__lo_{c}"))
                / (F.col(f"__hi_{c}") - F.col(f"__lo_{c}")),
            )
        out = out.withColumn(c + out_suffix, F.round(expr, 6))
    drop = [col for col in out.columns if col.startswith("__")]
    return out.drop(*drop)


def quantile_normalize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    grid: int = 1001,
    out_col: str | None = None,
    max_exact_rows: int | None = 2_000_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Map each group's values onto the GLOBAL distribution — the
    cross-batch drift corrector (microarray quantile normalization /
    feature-store distribution alignment): a value at percentile r of
    its group maps to the global distribution's quantile at r, so
    every group ends up identically distributed while preserving
    within-group order.

    Plan: the global quantile GRID (``grid`` equally spaced exact
    interpolated percentiles — one bounded array, broadcast) + one
    percent_rank window per group + an element_at lookup. Facts
    shuffle once for the rank window; the grid is ``grid`` doubles
    regardless of data size. Above ``max_exact_rows`` total rows the
    grid switches to approx_percentile sketches (same audited
    size-switch contract as operators/robust.py — exact at oracle
    scale, sketch at 100 TB)."""
    from pipeline_dataengineer_spark.operators.robust import (
        _percentile_mode,
    )

    out_col = out_col or f"{value_col}_qnorm"
    exact, _mx = _percentile_mode(df, None, max_exact_rows)
    fracs = F.array(*[F.lit(i / (grid - 1)) for i in range(grid)])
    if exact:
        qcol = F.percentile(value_col, fracs)
    else:
        qcol = F.percentile_approx(value_col, fracs, F.lit(accuracy))
    qs = df.agg(qcol.alias("__q"))
    w = Window.partitionBy(*key_cols).orderBy(value_col)
    idx = (
        F.round(F.percent_rank().over(w) * (grid - 1)).cast("int") + 1
    )
    return (
        df.crossJoin(F.broadcast(qs))
        .withColumn(out_col, F.element_at("__q", idx))
        .drop("__q")
    )


def impute(
    df: DataFrame,
    value_cols: list[str],
    strategy: str = "mean",
    group_cols: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Null imputation per column (optionally per group):
    ``strategy`` ∈ mean | median | mode | zero. The fill values come
    from ONE combinable aggregate (mode = deterministic max_by over
    value counts with a value tie-break) broadcast back — the fact
    table never shuffles, the same stats-join shape as
    ``scale_features``. ``suffix`` writes filled copies instead of
    overwriting. Groups whose fill value is itself NULL (all-null
    group) stay NULL — imputation never invents data."""
    g = list(group_cols or [])
    if strategy == "zero":
        out = df
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.coalesce(F.col(c), F.lit(0.0))
            )
        return out
    if strategy == "mode":
        # per-column value counts -> deterministic argmax
        out = df
        for c in value_cols:
            counts = (
                df.filter(F.col(c).isNotNull())
                .groupBy(*g, F.col(c).alias("__v"))
                .agg(F.count("*").alias("__n"))
            )
            top = counts.groupBy(*g).agg(
                F.max_by(
                    "__v", F.struct(F.col("__n"), F.col("__v"))
                ).alias(f"__fill_{c}")
            )
            joined = (
                out.join(F.broadcast(top), g) if g
                else out.crossJoin(F.broadcast(top))
            )
            out = joined.withColumn(
                f"{c}{suffix}", F.coalesce(F.col(c), F.col(f"__fill_{c}"))
            ).drop(f"__fill_{c}")
        return out
    agg_fn = {"mean": F.avg, "median": lambda c: F.median(c)}.get(strategy)
    if agg_fn is None:
        raise ValueError(f"unknown strategy {strategy!r}")
    aggs = [agg_fn(c).alias(f"__fill_{c}") for c in value_cols]
    fills = df.groupBy(*g).agg(*aggs) if g else df.agg(*aggs)
    joined = (
        df.join(F.broadcast(fills), g) if g else df.crossJoin(F.broadcast(fills))
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.coalesce(F.col(c), F.col(f"__fill_{c}"))
        ).drop(f"__fill_{c}")
    return out


_BOXCOX_GRID = [
    -2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0,
]


def boxcox_lambda(
    df: DataFrame,
    value_col: str,
    grid: list[float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Box-Cox λ selection by profile maximum likelihood over a
    candidate grid — the standard de-skewing transform for heavy-
    tailed features (prices, latencies, token counts) before models
    that assume symmetric noise:

        y(λ) = (x^λ − 1)/λ   (λ ≠ 0),  ln x  (λ = 0)
        LL(λ) = −n/2·ln(σ̂²(λ)) + (λ−1)·Σ ln x

    with σ̂² the MLE variance of the transformed values. Requires
    x > 0 (rows with x ≤ 0 or NULL are excluded, the classical
    definition). Returns the per-λ table (lam, loglik, best) with
    best = true on the argmax (ties to the smaller λ) — the whole
    selection is inspectable, not just the winner.

    ONE PASS for the whole grid: every LL needs only (n, Σy, Σy²,
    Σ ln x), so all |grid| candidates ride in a single combinable
    aggregate — map-side partials shrink each partition to
    2·|grid|+2 doubles; no per-λ jobs, no sort, no window. Pair with
    ``boxcox_transform`` to apply the winner."""
    grid = _BOXCOX_GRID if grid is None else list(grid)
    x = F.col(value_col).cast("double")
    pos = df.filter(x.isNotNull() & (x > 0)).select(x.alias("__x"))

    def transformed(lam: float):
        if lam == 0.0:
            return F.ln(F.col("__x"))
        return (F.pow(F.col("__x"), F.lit(lam)) - 1.0) / F.lit(lam)

    aggs = [F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum(F.ln(F.col("__x"))).alias("__slx")]
    for i, lam in enumerate(grid):
        yv = transformed(lam)
        aggs.append(F.sum(yv).alias(f"__s{i}"))
        aggs.append(F.sum(yv * yv).alias(f"__q{i}"))
    stats = pos.agg(*aggs)
    rows = []
    for i, lam in enumerate(grid):
        n, s, q = F.col("__n"), F.col(f"__s{i}"), F.col(f"__q{i}")
        var = (q - s * s / n) / n
        ll = (
            F.lit(-0.5) * n * F.ln(var)
            + (F.lit(lam) - 1.0) * F.col("__slx")
        )
        rows.append(
            F.struct(
                F.lit(lam).alias("lam"),
                F.round(ll, round_to).alias("loglik"),
            )
        )
    per_lam = stats.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.lam", "r.loglik")
    w_best = Window.orderBy(F.col("loglik").desc(), F.col("lam").asc())
    return per_lam.withColumn(
        "best", F.row_number().over(w_best) == 1
    )


def boxcox_transform(
    df: DataFrame,
    value_col: str,
    lam: float,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Apply the Box-Cox transform at a chosen λ (from
    boxcox_lambda's best row): fused narrow projection, no shuffle.
    x ≤ 0 / NULL transforms to NULL."""
    out_col = out_col or f"{value_col}_bc"
    x = F.col(value_col).cast("double")
    if lam == 0.0:
        yv = F.ln(x)
    else:
        yv = (F.pow(x, F.lit(lam)) - 1.0) / F.lit(lam)
    return df.withColumn(
        out_col,
        F.when(x.isNotNull() & (x > 0), F.round(yv, round_to)),
    )
