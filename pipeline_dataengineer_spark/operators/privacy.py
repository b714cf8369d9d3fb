"""Anonymity guarantees over tabular releases: k-anonymity suppression
and l-diversity auditing.

A released table is k-anonymous over a set of quasi-identifier columns
(the attacker-joinable ones: zip, birth date, nation, segment, ...)
when every combination of quasi-identifier values — every *equivalence
class* — covers at least k rows, so no row can be singled out below a
crowd of k. l-diversity strengthens it: each class must also contain
at least l distinct values of the sensitive attribute, or the class
leaks the attribute even without re-identification.

Scale shape: both operators are one shuffle on the quasi-identifier
key. ``k_anonymize`` uses a window count (class sizes attach to rows
without a second pass over the facts); the audit is a plain combinable
groupBy whose output is equivalence-class-sized, not fact-sized.
Skewed classes (a giant "unknown zip" class) are ordinary AQE-
splittable aggregation skew — no per-class state beyond the counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    out_col: str | None = None,
) -> DataFrame:
    """Suppression-model k-anonymity: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members.
    NULL quasi-identifier values form their own class (standard
    grouping semantics), so "missing zip" rows protect each other.

    With ``out_col`` set, nothing is dropped: the class size is
    attached under that name instead (callers can route small classes
    to a generalization/escrow path rather than losing them).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*quasi_cols)
    size = F.count(F.lit(1)).over(w)
    if out_col is not None:
        return df.withColumn(out_col, size)
    return (
        df.withColumn("__cls_n", size)
        .filter(F.col("__cls_n") >= k)
        .drop("__cls_n")
    )


def anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    ``(quasi..., class_size, n_sensitive)`` where ``n_sensitive`` is
    the exact distinct count of the sensitive attribute within the
    class (omitted when no sensitive column is given). The table's
    k-anonymity is ``min(class_size)``; its distinct-l-diversity is
    ``min(n_sensitive)``.

    One combinable groupBy; distinct-count is exact (it partially
    aggregates on (class, sensitive) first under the hood), and the
    output is class-count-sized.
    """
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def l_diverse_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the standard name of the parameter
) -> DataFrame:
    """Equivalence classes satisfying distinct-l-diversity: at least
    ``l`` distinct sensitive values. The complement (classes returned
    by the audit but absent here) is the leak set a release gate
    should block on."""
    return anonymity_audit(df, quasi_cols, sensitive_col).filter(
        F.col("n_sensitive") >= l
    )


GENERALIZATION_LADDER = ("day", "week", "month", "quarter", "year")


def generalize_dates_to_k(
    df: DataFrame,
    date_col: str,
    quasi_cols: list[str],
    k: int,
    out_col: str | None = None,
) -> tuple[DataFrame, str]:
    """Generalization-model k-anonymity for a date quasi-identifier:
    coarsen the date along the standard ladder
    day → week → month → quarter → year and pick the FINEST level at
    which every (generalized date, quasi...) equivalence class holds
    at least k rows — trading precision for anonymity instead of
    dropping rows (the suppression model k_anonymize implements).

    Returns (df with the generalized column, chosen_level). Raises
    when even year-level classes stay under k (generalizing further
    is erasing the column — the caller must decide that).

    Scale: one combinable min-of-class-size aggregate per ladder rung
    (≤5 passes, each class-count-sized before the 1-row min); only
    five scalars reach the driver. The rewrite itself is one fused
    projection."""
    out = out_col or date_col
    d = F.col(date_col).cast("date")

    def level_expr(level: str):
        return d if level == "day" else F.trunc(d, level)

    chosen = None
    for level in GENERALIZATION_LADDER:
        min_class = (
            df.groupBy(level_expr(level).alias("__g"), *quasi_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(F.min("__n"))
            .collect()[0][0]
        )
        if min_class is not None and min_class >= k:
            chosen = level
            break
    if chosen is None:
        raise ValueError(
            f"even year-level generalization leaves a class under k={k}"
        )
    return df.withColumn(out, level_expr(chosen)), chosen


def entropy_l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 — the standard name of the parameter
    round_to: int = 6,
) -> DataFrame:
    """Entropy l-diversity audit (Machanavajjhala et al. 2007): a
    class passes when the Shannon entropy of its sensitive-value
    distribution is at least ln(l) — a strictly stronger requirement
    than distinct-l-diversity, which a class can satisfy with one
    dominant value and l−1 singletons. Returns one row per
    equivalence class: (quasi..., class_size, n_sensitive, entropy,
    entropy_ok).

    Shape: one combinable groupBy on (class, sensitive) — cell-sized,
    never fact-sized — then a window SUM partitioned by the class key
    over those cells to get class totals, and a second cell-sized
    groupBy for −Σ p·ln p. No fact-sized window, no driver state.
    """
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    wq = Window.partitionBy(*quasi_cols)
    p = F.col("__nv") / F.sum("__nv").over(wq)
    per_class = (
        cells.withColumn("__term", -p * F.log(p))
        .groupBy(*quasi_cols)
        .agg(
            F.sum("__nv").alias("class_size"),
            F.count(F.lit(1)).alias("n_sensitive"),
            F.round(F.sum("__term"), round_to).alias("entropy"),
        )
    )
    import math

    return per_class.withColumn(
        "entropy_ok",
        (F.col("entropy") >= F.lit(round(math.log(l), round_to))).cast(
            "int"
        ),
    )
