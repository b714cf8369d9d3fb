"""Skyline (Pareto frontier) queries.

The multi-criteria shortlist: rows not strictly dominated on a
(maximize, minimize) objective pair — best price/freshness
trade-offs, quality-vs-toxicity document shortlists, cost/latency
frontier of config sweeps. Strict dominance: ``a`` dominates ``b``
iff ``a`` is >= on the maximize axis, <= on the minimize axis, and
strictly better on at least one.

The naive formulation is a quadratic self-anti-join (the DuckDB
oracle for ``q_skyline`` does exactly that, independently). Here the
2-D skyline is the classic sweep, expressed relationally so it
scales:

1. collapse rows to distinct ``(group, max_col)`` classes with the
   class-best ``min(min_col)`` — one map-side-combinable aggregate;
2. one window over the CLASS table (price-distinct, orders of
   magnitude smaller than the fact table) computes the best
   ``min_col`` among strictly-better ``max_col`` classes — rows
   frame over distinct classes makes "strictly greater" exact, no
   RANGE-frame float edge cases;
3. join the class verdict back and keep rows that tie their class
   best on ``min_col`` (same-class dominance is strict on the other
   axis) and beat every strictly-better class.

Work: one shuffle of the facts on (group, max_col), a class-sized
window, one class-sized join back (broadcast when classes fit).
Dominance is scheduling-independent, so the result is deterministic;
full duplicates are mutually non-dominating and all survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    maximize: str,
    minimize: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier of (``maximize`` ↑,
    ``minimize`` ↓), per ``group_cols`` partition (global when None).
    Higher dimensions need a different algorithm (partitioned
    block-nested-loop); this is the exact 2-D sweep."""
    grp = group_cols or []
    classes = df.groupBy(*grp, maximize).agg(
        F.min(minimize).alias("__class_best")
    )
    w = (
        Window.partitionBy(*grp)
        .orderBy(F.col(maximize).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    verdict = classes.withColumn("__best_above", F.min("__class_best").over(w))
    survivors = verdict.filter(
        F.col("__best_above").isNull()
        | (F.col("__best_above") > F.col("__class_best"))
    ).select(*grp, maximize, "__class_best")
    return (
        df.join(survivors, on=[*grp, maximize])
        .filter(F.col(minimize) == F.col("__class_best"))
        .drop("__class_best")
    )
