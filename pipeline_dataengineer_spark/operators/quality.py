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


def benford_test(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Benford's-law first-digit screen (the classic forensic /
    data-quality test for invented numbers): observed first-digit
    frequencies of positive values vs the log10(1 + 1/d) expectation,
    with the chi-square distance. Returns one row per digit (and
    group): (digit, n_obs, freq_obs, freq_expected, chi2_term).

    One combinable groupBy over the facts (digit via string ops on
    the absolute value — codegen, no UDF); everything after is
    9-rows-per-group algebra. Sum chi2_term and compare to the
    chi-square(8 dof) critical value of your chosen alpha."""
    from pyspark.sql import functions as F

    g = list(group_cols or [])
    first_digit = F.substring(
        F.regexp_replace(
            F.abs(F.col(value_col)).cast("string"), r"[^1-9]", ""
        ),
        1,
        1,
    ).cast("int")
    base = df.filter(
        F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) > 0)
    ).withColumn("digit", first_digit)
    counts = base.groupBy(*g, "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    totals = counts.groupBy(*g).agg(F.sum("n_obs").alias("__t"))
    joined = (
        counts.join(F.broadcast(totals), g)
        if g
        else counts.crossJoin(F.broadcast(totals))
    )
    freq = F.col("n_obs") / F.col("__t")
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    return joined.select(
        *g,
        "digit",
        "n_obs",
        freq.alias("freq_obs"),
        exp.alias("freq_expected"),
        (
            (freq - exp) * (freq - exp) / exp * F.col("__t")
        ).alias("chi2_term"),
    )


def observe_rules(df: DataFrame, rules: list[Rule], name: str = "dq"):
    """Attach ``run_checks``-style rules to a DataFrame as OBSERVED
    METRICS — Spark's ``observe`` API computes them as a side effect
    of whatever action the caller runs next, with ZERO extra passes
    over the data (vs ``run_checks``'s dedicated aggregate job).

    The free-metrics shape for production pipelines: the write job
    itself reports its violation counts. Returns ``(df, observation)``
    — run any action on ``df`` (e.g. the write), then
    ``observation.get`` yields ``{rule_name: n_violations}``.

    Supports the single-pass rule subset (``not_null``,
    ``accepted_values``, ``min``, ``max`` — conditional counts).
    ``unique`` needs its own distinct aggregation and ``referential``
    a second table; both stay with ``run_checks``."""
    from pyspark.sql import Observation

    aggs = []
    for rule in rules:
        kind, col = rule[0], rule[1]
        label = f"{kind}:{col}"
        c = F.col(col)
        if kind == "not_null":
            bad = c.isNull()
        elif kind == "accepted_values":
            bad = c.isNotNull() & ~c.isin(*rule[2])
        elif kind == "min":
            bad = c < rule[2]
        elif kind == "max":
            bad = c > rule[2]
        else:
            raise ValueError(
                f"observe_rules: unsupported rule {kind!r} "
                "(unique/referential need dedicated passes — use run_checks)"
            )
        aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(label)
        )
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def fd_violations(
    df: DataFrame,
    lhs_cols: list[str],
    rhs_col: str,
    max_examples: int = 3,
) -> DataFrame:
    """Functional-dependency check lhs → rhs (the profiling question
    behind normalization and join-key audits: does zip determine
    city? does order determine customer?): one row per violating lhs
    group with the distinct-rhs count and up to ``max_examples``
    conflicting values. Empty result = the FD holds exactly.

    One combinable aggregate on the lhs key; examples come from a
    bounded slice of each group's distinct rhs values (sorted for
    determinism), so output rows are violation-sized, never
    fact-sized."""
    from pyspark.sql import functions as F

    g = df.groupBy(*lhs_cols).agg(
        F.countDistinct(rhs_col).alias("n_distinct_rhs"),
        F.slice(
            F.sort_array(F.collect_set(F.col(rhs_col).cast("string"))),
            1,
            max_examples,
        ).alias("examples"),
    )
    return g.filter(F.col("n_distinct_rhs") > 1)
