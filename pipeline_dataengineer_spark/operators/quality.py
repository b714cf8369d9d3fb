"""Declarative data-quality checks (dbt-test / Deequ family).

An ETL engine needs its gatekeeping to be as distributed as its
transforms: these checks compile a rule list into ONE aggregate pass
over the table (every rule is a conditional count — map-side
combinable, no rule-by-rule rescans), plus one anti-join per
referential rule. Output is a small (rule, n_violations, passed)
table — alert/gate on it, or join it into a run ledger.

Rules:
- ``("not_null", col)``             — col must have no NULLs
- ``("unique", col)``               — col must have no duplicate values
- ``("accepted_values", col, vals)``— col values ∈ vals (NULL exempt)
- ``("min", col, bound)``           — min(col) >= bound
- ``("max", col, bound)``           — max(col) <= bound
- referential integrity runs separately via ``check_referential``
  (child keys must exist in the parent) because it needs the second
  table; it is an anti-join whose output joins the same report shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Compile ``rules`` into one aggregate pass; returns
    (rule, n_violations, passed). ``unique`` rules need a distinct
    count, which Spark computes in the same aggregate via expand —
    still one scan of the input."""
    aggs = []
    names = []
    for rule in rules:
        kind, col = rule[0], rule[1]
        name = f"{kind}:{col}"
        c = F.col(col)
        if kind == "not_null":
            agg = F.count(F.when(c.isNull(), 1))
        elif kind == "unique":
            # duplicates = non-null rows minus distinct non-null values
            agg = F.count(c) - F.count_distinct(c)
        elif kind == "accepted_values":
            vals = rule[2]
            agg = F.count(F.when(c.isNotNull() & ~c.isin(*vals), 1))
            name = f"{kind}:{col}"
        elif kind == "min":
            bound = rule[2]
            agg = F.count(F.when(c < F.lit(bound), 1))
            name = f"min:{col}>={bound}"
        elif kind == "max":
            bound = rule[2]
            agg = F.count(F.when(c > F.lit(bound), 1))
            name = f"max:{col}<={bound}"
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        aggs.append(agg.cast("long").alias(name))
        names.append(name)
    row = df.agg(*aggs)
    # unpivot the single summary row → one row per rule (same shape
    # as profiling.profile_table: no second scan, no driver loop)
    stacked = row.unpivot([], names, "rule", "n_violations")
    return stacked.select(
        "rule",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential integrity: child rows whose non-null key has no
    parent. LEFT ANTI on the key (broadcast when the parent key set
    is dimension-sized; AQE decides otherwise). Same report schema
    as run_checks."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_violations"))
    )
    return orphans.select(
        F.lit(f"referential:{child_key}->{parent_key}").alias("rule"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
