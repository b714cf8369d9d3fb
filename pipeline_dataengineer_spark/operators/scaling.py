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

from pyspark.sql import DataFrame
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
