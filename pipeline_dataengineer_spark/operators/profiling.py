"""Table profiling: per-column summary statistics in one pass.

The ``ANALYZE``/data-quality step of a pipeline: null counts,
distinct counts, min/max per column, emitted as one row per column.
All columns are profiled in a SINGLE aggregation over the table
(Spark computes every aggregate in the same partial+final pass), then
the one summary row is exploded into per-column rows driver-free.
At 100 TB this is one full scan — the same cost as any count(*) —
instead of one scan per column, and the unpivot happens on a
single-row DataFrame so it is effectively free.

The reference has no profiling surface (SURVEY.md §2 Part B math/agg
rows are 'absent'); this is a north-star pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so mixed
    column types coexist in one result. Exact distinct counts (use
    approx_profile for sketch-based at extreme cardinalities)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    summary = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return summary.select(F.explode(per_col).alias("p")).select("p.*")


def approx_profile(df: DataFrame, columns: list[str] | None = None,
                   rsd: float = 0.05) -> DataFrame:
    """Sketch-based variant: HLL++ distinct counts (rsd-controlled).
    Same single-pass shape; values are engine-specific (rows-only
    check territory) but the scan cost is identical and the state per
    column is O(1) instead of O(distinct)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.approx_count_distinct(F.col(c), rsd).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    summary = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return summary.select(F.explode(per_col).alias("p")).select("p.*")


def corr_matrix(df, cols: list[str]):
    """Pearson correlation matrix of ``cols`` in ONE scan: every
    pairwise corr is an aggregate expression in a single agg() call
    (Spark computes all of them in one partial+final pass — no
    per-pair rescans, no driver loop over the data), then the one
    summary row unpivots to (col_a, col_b, corr) tidy form covering
    the upper triangle incl. the diagonal."""
    from pyspark.sql import functions as F

    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            name = f"{a}|{b}"
            aggs.append(F.corr(a, b).alias(name))
            names.append(name)
    row = df.agg(*aggs)
    tidy = row.unpivot([], names, "pair", "corr")
    return tidy.select(
        F.split("pair", r"\|")[0].alias("col_a"),
        F.split("pair", r"\|")[1].alias("col_b"),
        F.col("corr"),
    )


def heavy_hitters(
    df, col: str, min_share: float = 0.01, by: list[str] | None = None
):
    """EXACT heavy hitters: values of ``col`` holding at least
    ``min_share`` of rows (optionally within each ``by`` group).

    Shape at scale: one map-side-combinable groupBy over (by, col) —
    the result is |distinct| rows — then the group totals (|by| rows)
    come back via a broadcast join. The fact table is scanned once
    and shuffles once, on the grouping key. For columns whose
    cardinality itself is the problem (no groupBy result fits),
    use the sketch path (``functions.sketches.topk_states``) instead:
    fixed-size state, approximate counts.

    Returns (by..., item, cnt, share) ordered nowhere — callers sort.
    """
    from pyspark.sql import functions as F

    by = by or []
    counts = df.groupBy(*by, F.col(col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if by:
        totals = df.groupBy(*by).agg(F.count(F.lit(1)).alias("__total"))
        joined = counts.join(F.broadcast(totals), by)
    else:
        totals = df.agg(F.count(F.lit(1)).alias("__total"))
        joined = counts.crossJoin(F.broadcast(totals))
    return (
        joined.withColumn(
            "share", F.round(F.col("cnt") / F.col("__total"), 6)
        )
        .filter(F.col("cnt") >= F.col("__total") * min_share)
        .drop("__total")
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Pre-flight shuffle-skew diagnosis for a planned join/groupBy
    key: the ``top`` heaviest key values with their row share, plus
    per-key-space summary columns (total rows, distinct keys, max
    share, the p99-to-median frequency ratio) — the numbers that
    decide between a plain shuffle, a broadcast, AQE skew splits, or
    an explicit salt factor (operators/skew.py).

    ONE combinable groupBy builds the frequency table; everything
    after runs on the key-sized table (top-k via one bounded sort,
    quantiles over frequencies). Emitting the report as a DataFrame
    keeps it composable — land it next to the job's metrics or gate
    on it in a DQ check."""
    freq = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_rows"))
    stats = freq.agg(
        F.sum("key_rows").alias("__total"),
        F.count(F.lit(1)).alias("__distinct"),
        F.max("key_rows").alias("__max"),
        F.percentile_approx("key_rows", F.lit(0.99), F.lit(10_000)).alias(
            "__p99"
        ),
        F.percentile_approx("key_rows", F.lit(0.5), F.lit(10_000)).alias(
            "__med"
        ),
    )
    topk = freq.orderBy(F.col("key_rows").desc(), *key_cols).limit(top)
    return topk.crossJoin(F.broadcast(stats)).select(
        *key_cols,
        "key_rows",
        F.round(F.col("key_rows") / F.col("__total"), 6).alias("row_share"),
        F.col("__total").alias("total_rows"),
        F.col("__distinct").alias("distinct_keys"),
        F.round(F.col("__max") / F.col("__total"), 6).alias("max_share"),
        F.round(F.col("__p99") / F.col("__med"), 2).alias("p99_med_ratio"),
        F.ceil(
            F.col("key_rows")
            / (F.col("__total") / F.lit(32))
        ).cast("int").alias("suggested_salt"),
    )


def concentration_metrics(
    df: DataFrame,
    value_col: str,
    entity_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Market/corpus concentration per group: Gini coefficient,
    Herfindahl-Hirschman index, and top-1 share over per-entity
    totals — "is this domain's traffic dominated by a few hosts",
    "is revenue concentrated in one customer". Returns one row per
    group: (gini, hhi, top1_share, n_entities).

    Facts collapse to entity totals with ONE combinable aggregate;
    the Gini rank window and every metric after run on the
    entity-sized table. Gini uses the sorted-rank identity
    G = 2*Σ(i*x_i) / (n*Σx) - (n+1)/n with ties broken by entity for
    determinism; all-zero groups return NULL gini (undefined) and 0
    hhi."""
    g = list(group_cols or [])
    totals = df.groupBy(*g, *entity_cols).agg(
        F.sum(value_col).alias("__x")
    )
    w = Window.partitionBy(*g).orderBy(F.col("__x").asc(), *entity_cols)
    ranked = totals.withColumn("__i", F.row_number().over(w))
    return (
        ranked.groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("__x").alias("__s"),
            F.sum(F.col("__i") * F.col("__x")).alias("__is"),
            F.max("__x").alias("__mx"),
            F.sum(F.col("__x") * F.col("__x")).alias("__xx"),
        )
        .select(
            *g,
            "n_entities",
            F.when(
                F.col("__s") > 0,
                2.0 * F.col("__is") / (F.col("n_entities") * F.col("__s"))
                - (F.col("n_entities") + 1.0) / F.col("n_entities"),
            ).alias("gini"),
            F.when(
                F.col("__s") > 0,
                F.col("__xx") / (F.col("__s") * F.col("__s")),
            )
            .otherwise(0.0)
            .alias("hhi"),
            F.when(F.col("__s") > 0, F.col("__mx") / F.col("__s")).alias(
                "top1_share"
            ),
        )
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram per group: (bin, bin_lo, bin_hi, n) with
    out-of-range values clamped into the edge bins and NULLs counted
    separately (bin = -1) — the profiling shape dashboards bin on.
    Bounds default to the global min/max (one combinable pre-pass);
    passing explicit ``lo``/``hi`` skips that pass entirely. Binning
    is a pure codegen floor expression; counts are ONE combinable
    groupBy."""
    g = list(group_cols or [])
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(
            F.min(v).alias("lo"), F.max(v).alias("hi")
        ).collect()[0]
        # empty / all-NULL input leaves min/max NULL: any bounds do
        # (every surviving row is NULL -> bin -1 regardless), so fall
        # back instead of TypeError(float(None))
        if lo is None:
            lo = float(row["lo"]) if row["lo"] is not None else 0.0
        if hi is None:
            hi = float(row["hi"]) if row["hi"] is not None else 1.0
    if hi <= lo:
        hi = lo + 1.0
    w = (hi - lo) / bins
    raw_bin = F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")
    bin_idx = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw_bin))
    )
    return (
        df.withColumn("__b", bin_idx)
        .groupBy(*g, "__b")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *g,
            F.col("__b").alias("bin"),
            F.when(
                F.col("__b") >= 0, F.lit(lo) + F.col("__b") * F.lit(w)
            ).alias("bin_lo"),
            F.when(
                F.col("__b") >= 0, F.lit(lo) + (F.col("__b") + 1) * F.lit(w)
            ).alias("bin_hi"),
            "n",
        )
    )
