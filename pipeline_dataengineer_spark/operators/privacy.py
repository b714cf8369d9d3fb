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


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    round_to: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) for an
    ORDERED sensitive attribute — the member of the anonymity ladder
    k-anonymity (size) and l-diversity (variety) miss: a class can be
    large and varied yet still skewed (all its salaries in the top
    decile). t = the ordered-distance Earth Mover's Distance between
    the class's sensitive distribution and the whole table's,

        t = (1/(m-1)) · Σ_i | Σ_{j<=i} (p_class(v_j) − p_global(v_j)) |

    over the m ordered distinct sensitive values. Returns one row per
    equivalence class: (quasi_cols..., class_size, t). Release gate:
    max(t) <= threshold (0.15-0.2 in the paper's experiments).

    Scale shape: two combinable groupBys (global value histogram —
    domain-sized; class × value histogram — class·domain-sized), one
    broadcast join of the global histogram onto the class cells, and
    a per-class ordered window over the DOMAIN (never the facts) for
    the running sum. The domain must be release-bounded (bin
    continuous attributes first — the same precondition the paper
    imposes); the fact table is touched exactly twice, map-side
    combined both times. NULL sensitive values are excluded (they are
    a disclosure question for l-diversity, not distance).
    """
    v = F.col(sensitive_col)
    base = df.filter(v.isNotNull())
    # global histogram over the ordered domain (m rows)
    glob = base.groupBy(v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__gn")
    )
    g_tot = base.count()
    m = glob.count()
    if m < 2:
        # a single-value domain: every class matches it exactly
        return (
            base.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("t", F.lit(0.0))
        )
    # class x value cells (class·m rows) — full domain per class via
    # the broadcast cross of class list x domain, so absent values
    # count as p_class = 0 (the EMD needs the zeros)
    classes = base.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    cells = base.groupBy(*quasi_cols, v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__cn")
    )
    full = (
        classes.crossJoin(F.broadcast(glob))
        .join(cells, [*quasi_cols, "__v"], "left")
        .withColumn("__cn", F.coalesce(F.col("__cn"), F.lit(0)))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # EXACT integer running sum: p_c(v) − p_g(v) over the common
    # denominator class_size·g_tot has integer numerator
    # cn·g_tot − gn·class_size, so the cumsum AND the Σ|·| are exact
    # longs under any accumulation order — the whole statistic is a
    # single final division, bit-identical across engines (the float
    # formulation's Σ of m doubles is order-sensitive in the last
    # ulp, a round() boundary class). Bound: needs
    # class_size·g_tot·m < 2^63 — comfortably true at audit scale
    # (the domain is release-bounded by precondition).
    run = F.sum(
        F.col("__cn") * F.lit(g_tot) - F.col("__gn") * F.col("class_size")
    ).over(w)
    return (
        full.withColumn("__run", run)
        .groupBy(*quasi_cols)
        .agg(
            F.first("class_size").alias("class_size"),
            F.round(
                F.sum(F.abs(F.col("__run")))
                / (F.first("class_size") * F.lit(float(g_tot)) * F.lit(m - 1)),
                round_to,
            ).alias("t"),
        )
    )
