"""Time-series resampling: per-group date spines and gap filling.

Event/order streams have holes (days with no rows); downstream
rollups, moving averages, and charting need a dense axis. The dense
axis is generated *distributed*: per-group bounds via one aggregate,
then ``sequence()`` + ``explode()`` (rows are produced executor-side
from each group's min/max — no driver-side range materialization, so
a 10-year × 10M-group spine never touches the driver). The reference
has no time-series ops; generalizes its daily-batch cadence
(SURVEY.md §3.1) into a queryable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def date_spine(df: DataFrame, date_col: str, group_cols: list[str]) -> DataFrame:
    """One row per (group, day) covering each group's [min, max] date
    range. Input ``date_col`` must already be DateType."""
    bounds = df.groupBy(*group_cols).agg(
        F.min(date_col).alias("_mn"), F.max(date_col).alias("_mx")
    )
    return bounds.select(
        *group_cols,
        F.explode(F.sequence("_mn", "_mx", F.expr("INTERVAL 1 DAY"))).alias(date_col),
    )


def resample_daily(
    df: DataFrame,
    date_col: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Daily aggregate per group with gaps filled: aggregate first
    (shrinks the fact table to one row per group-day BEFORE the spine
    join — at scale the join touches the aggregate, never the raw
    rows), then left-join onto the dense spine and coalesce fills."""
    agged = (
        df.withColumn(date_col, F.col(date_col).cast("date"))
        .groupBy(*group_cols, date_col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    spine = date_spine(agged, date_col, group_cols)
    joined = spine.join(agged, on=[*group_cols, date_col], how="left")
    fill = fill or {}
    out_cols = [*group_cols, date_col]
    for name in aggs:
        c = F.col(name)
        if name in fill:
            c = F.coalesce(c, F.lit(fill[name]))
        out_cols.append(c.alias(name))
    return joined.select(*out_cols)


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Carry the last non-null observation forward per key (the
    sensor/SCD gap-repair primitive). One shuffle on the key; the
    fill is last(ignorenulls) over an unbounded-preceding frame —
    same definition as SQL last_value(... IGNORE NULLS), so it
    oracle-checks. Leading nulls (nothing to carry) stay null."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def _spread_by_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explicit hash repartition on the grouping key before a
    grouped-map recursion. The grouped-map's own exchange is small in
    BYTES (ids + scalars), so AQE coalesces it — sometimes to ONE
    task — but the per-row Python recursion cost is invisible to AQE,
    and a coalesced plan serializes every key through one worker
    (measured 5.6s -> 1.2s on 100k rows x 150 keys at local[32]). A
    user-specified repartition is exempt from AQE coalescing and
    satisfies the groupBy's distribution requirement, so there is
    still exactly ONE shuffle."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *key_cols)


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per key (recursive:
    e_t = alpha*x_t + (1-alpha)*e_{t-1}) via applyInPandas — the
    recursion is genuinely not window-expressible without a
    numerically explosive (1-a)^(-t) rewrite, so this is the
    sanctioned Arrow grouped-map path. One shuffle on the key; each
    group must fit one executor's memory, the same constraint any
    per-key sequential model has.

    The recursion is computed EXPLICITLY (e = a·x + (1−a)·e, exactly
    the operand order streaming/stateful.py:streaming_ewma and the
    WITH RECURSIVE oracle use) rather than via pandas ewm:
    pandas' adjust=False path runs a different internal accumulation
    (old-weight renormalization) whose results drift from the plain
    recursion by an ulp on long series — enough to flip round(4) on
    ~3 rows per 100k (caught by the round-5 sf0.1 sweep). Same
    numbers everywhere beats vectorized-but-almost.

    NaN handling: NaN inputs emit NaN and leave the carried state
    untouched — i.e. pandas ewm(adjust=False, ignore_na=True), NOT
    pandas' default ignore_na=False. The streaming twin can't
    renormalize weights across a gap it never re-reads, and
    batch≡streaming bit-parity wins over pandas-default parity."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    # build a FRESH StructType — StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object, so
    # df.schema.add(...) silently corrupts df.columns.
    schema_out = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        out = np.empty_like(vals)
        e = None
        for i, v in enumerate(vals):
            if np.isnan(v):
                # NaN input: emit NaN, carry state UNCHANGED — this
                # is pandas ewm(adjust=False, ignore_na=True)
                # semantics, NOT pandas' default ignore_na=False
                # (which would renormalize weights across the gap).
                # Chosen deliberately: the streaming twin
                # (streaming_ewma) cannot look back across a gap to
                # renormalize, and batch≡streaming bit-parity is the
                # contract. Covered by test_ewma_nan_ignore_na_true.
                out[i] = np.nan
                continue
            e = v if e is None else alpha * v + (1.0 - alpha) * e
            out[i] = e
        pdf[out_col] = out
        return pdf

    return _spread_by_key(df, key_cols).groupBy(*key_cols).applyInPandas(
        fn, schema=schema_out
    )


def rolling_zscore_outliers(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 20,
    threshold: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """Streaming-style anomaly flags: each row's value scored against
    the mean/stddev of the PRECEDING ``window`` rows of its key (the
    row itself excluded — no self-contamination, no future leakage).

    Adds ``zscore`` (NULL until ``min_history`` prior points exist or
    when the trailing stddev is 0) and ``is_outlier``. One shuffle on
    the key for the window sort; the frame is row-bounded so state per
    key is O(window) — the same plan a 100x corpus needs. For the
    unkeyed global case pass key_cols=[] consciously (single-task
    sort; prefer a key).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    n = F.count(value_col).over(w)
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(
        (n >= min_history) & (sd > 0),
        (F.col(value_col) - mu) / sd,
    )
    return df.withColumn("zscore", F.round(z, 4)).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False))
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 0,
    level_col: str = "level",
    trend_col: str = "trend",
    forecast_col: str = "forecast",
) -> DataFrame:
    """Holt double exponential smoothing per key (level + trend):

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}

    seeded l_0 = x_0, b_0 = x_1 - x_0 (b_0 = 0 for singleton keys).
    Emits per-row level/trend plus the h-step-ahead forecast
    l_t + h·b_t — the grouped forecasting primitive (capacity
    planning per tenant, per-domain crawl-volume projection).

    Same execution contract as ewma above: the coupled recursion is
    not window-expressible, so it runs as ONE shuffle on the key and
    a per-key numpy loop inside Arrow. The recursion is evaluated in
    a FIXED operand order (two multiplies + one add per equation), so
    results are bit-deterministic and an engine replaying the same
    ops (the q_holt_linear recursive-CTE oracle) agrees exactly."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(level_col, T.DoubleType()),
            T.StructField(trend_col, T.DoubleType()),
            T.StructField(forecast_col, T.DoubleType()),
        ]
    )
    a, b = float(alpha), float(beta)
    h = float(horizon)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(x)
        lev = np.empty(n)
        tr = np.empty(n)
        lev[0] = x[0]
        tr[0] = (x[1] - x[0]) if n > 1 else 0.0
        for i in range(1, n):
            prev = lev[i - 1] + tr[i - 1]
            lev[i] = a * x[i] + (1.0 - a) * prev
            tr[i] = b * (lev[i] - lev[i - 1]) + (1.0 - b) * tr[i - 1]
        pdf[level_col] = lev
        pdf[trend_col] = tr
        pdf[forecast_col] = lev + h * tr
        return pdf

    return _spread_by_key(df, key_cols).groupBy(*key_cols).applyInPandas(
        fn, schema=schema_out
    )


def clamped_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    delta_col: str,
    lo: float = 0.0,
    hi: float | None = None,
    out_col: str = "balance",
) -> DataFrame:
    """Running balance with saturation per key:
    ``bal_t = clamp(bal_{t-1} + delta_t, lo, hi)``, ``bal_{-1} = 0``
    — inventory levels (can't go negative, capacity-capped), token
    buckets / rate-limit counters, battery state of charge. The
    clamp makes this a GENUINE recursion: unlike a plain cumsum the
    window rewrite does not exist (each clamp discards information),
    so this is the sanctioned grouped-map path — one shuffle on the
    key, a numpy loop per key, fixed operand order
    (add, then greatest, then least) so the q_clamped_balance
    recursive-CTE oracle replays it bit-exactly."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )
    lo_f = float(lo)
    hi_f = float(hi) if hi is not None else float("inf")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        d = pdf[delta_col].to_numpy(dtype=np.float64)
        out = np.empty(len(d))
        acc = 0.0
        for i, x in enumerate(d):
            acc = min(max(acc + x, lo_f), hi_f)
            out[i] = acc
        pdf[out_col] = out
        return pdf

    return _spread_by_key(df, key_cols).groupBy(*key_cols).applyInPandas(
        fn, schema=schema_out
    )


def seasonal_decompose(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Classical additive decomposition value = trend + seasonal +
    resid (the moving-average core of STL, without STL's loess
    robustness loop) — entirely window/groupBy relational algebra, no
    Python in the path.

    - ``trend``: centered moving average of length ``period`` (for
      even periods the standard 2 x p double average), NULL where the
      window is not full — classical-decomposition edge semantics;
    - ``seasonal``: per-phase mean of the detrended series
      (phase = 0-based position mod period), re-centered so one full
      cycle of seasonals sums to ~0;
    - ``resid``: value - trend - seasonal (NULL where trend is).

    Scale: one shuffle on the key for the window sort, then a
    phase-level (key x period sized) combinable aggregate broadcast
    back — the series itself is shuffled once and never again. Per-key
    state is the window frame (period rows), so a million keys x
    arbitrary history stream through without hot-task risk; a SINGLE
    key's series does sort in one task chain, the inherent cost of an
    ordered per-key decomposition (same story as holt_linear).
    """
    half = period // 2
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    pos = F.row_number().over(w) - 1
    dfp = df.withColumn("__pos", pos)
    wo = Window.partitionBy(*key_cols).orderBy("__pos")
    if period % 2 == 1:
        frame = wo.rowsBetween(-half, half)
        full = (
            F.count(value_col).over(frame) == period
        )
        trend = F.when(full, F.avg(value_col).over(frame))
    else:
        f1 = wo.rowsBetween(-half, half - 1)
        f2 = wo.rowsBetween(-half + 1, half)
        full = (F.count(value_col).over(f1) == period) & (
            F.count(value_col).over(f2) == period
        )
        trend = F.when(
            full,
            (F.avg(value_col).over(f1) + F.avg(value_col).over(f2)) / 2,
        )
    t = dfp.withColumn("__trend", trend).withColumn(
        "__phase", F.pmod("__pos", F.lit(period))
    )
    detr = (F.col(value_col) - F.col("__trend")).alias("__detr")
    phase_means = (
        t.select(*key_cols, "__phase", detr)
        .groupBy(*key_cols, "__phase")
        .agg(F.avg("__detr").alias("__pm"))
    )
    centered = phase_means.withColumn(
        "__pm0",
        F.col("__pm")
        - F.avg("__pm").over(Window.partitionBy(*key_cols)),
    ).select(*key_cols, "__phase", "__pm0")
    # key x period rows — usually tiny, but a mega-key table makes a
    # forced broadcast a driver bomb; AQE downgrades gracefully
    out = t.join(centered, [*key_cols, "__phase"], "left")
    return (
        out.select(
            *df.columns,
            F.col("__trend").alias("trend"),
            F.col("__pm0").alias("seasonal"),
            (
                F.col(value_col) - F.col("__trend") - F.col("__pm0")
            ).alias("resid"),
        )
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULL gaps by linear interpolation between the nearest
    known neighbors (the Timescale/Influx ``interpolate`` gap-fill,
    the value-correct upgrade over forward_fill for sampled
    metrics): for a NULL at t between known (t0, v0) and (t1, v1),
    value = v0 + (v1 - v0) * (t - t0) / (t1 - t0). Leading/trailing
    NULLs (no neighbor on one side) stay NULL.

    Two IGNORE-NULLS windows per direction (value + its timestamp) —
    one shuffle on the key, frame state O(1) per row; numeric
    ``order_col`` (epoch/sequence) keeps the arithmetic portable."""
    out_col = out_col or value_col
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.col(order_col).cast("double")
    t_of_val = F.when(F.col(value_col).isNotNull(), t)
    pv = F.last(value_col, ignorenulls=True).over(w_back)
    pt = F.last(t_of_val, ignorenulls=True).over(w_back)
    nv = F.first(value_col, ignorenulls=True).over(w_fwd)
    nt = F.first(t_of_val, ignorenulls=True).over(w_fwd)
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (t - pt) / (nt - pt),
        )
    )
    return df.withColumn(out_col, interp)


def cross_correlation(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Lead/lag cross-correlation per key: corr(x_t, y_{t+lag}) for
    every lag in [-max_lag, max_lag] — "does marketing spend lead
    signups, and by how many days?". Returns (key..., lag, xcorr, n).

    One window sort per key materializes the 2*max_lag+1 shifted
    copies of y (lag/lead are O(1) frame lookups over the same sort —
    ONE shuffle total, not one per lag), then corr() per (key, lag)
    is a combinable aggregate over the stacked (lag, x, y_shift)
    rows. Row blowup is the constant 2*max_lag+1; NULL-paired edges
    fall out of corr's pairwise-complete semantics."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    # window expressions must be top-level projections (Spark rejects
    # them inside array/struct constructors), so materialize each
    # shifted copy as a column first — still ONE window sort, the
    # lead/lag frames share it.
    tmp = df
    names = []
    for lag in range(-max_lag, max_lag + 1):
        nm = f"__y_{lag + max_lag}"
        shift = (
            F.lead(y_col, lag).over(w)
            if lag >= 0
            else F.lag(y_col, -lag).over(w)
        )
        tmp = tmp.withColumn(nm, shift.cast("double"))
        names.append((lag, nm))
    shifted = [
        F.struct(
            F.lit(lag).alias("lag"),
            F.col(x_col).cast("double").alias("x"),
            F.col(nm).alias("y"),
        )
        for lag, nm in names
    ]
    stacked = tmp.select(
        *key_cols, F.explode(F.array(*shifted)).alias("s")
    ).select(
        *key_cols,
        F.col("s.lag").alias("lag"),
        F.col("s.x").alias("x"),
        F.col("s.y").alias("y"),
    )
    return (
        stacked.filter(F.col("y").isNotNull() & F.col("x").isNotNull())
        .groupBy(*key_cols, "lag")
        .agg(
            F.corr("x", "y").alias("xcorr"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def page_hinkley(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    delta: float = 0.005,
    threshold: float = 50.0,
    quantize: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Page–Hinkley drift detector per key — the classic sequential
    mean-shift monitor (Page 1954; the standard concept-drift test in
    streaming ML): with running mean μ_t = mean(x_1..x_t),

        m_t  = Σ_{i<=t} (x_i − μ_i − δ)
        PH⁺_t = m_t − min_{s<=t} m_s   (upward drift)
        PH⁻_t = max_{s<=t} m_s − m_t   (downward drift)

    and an alarm when either exceeds ``threshold``. δ is the
    magnitude tolerance (drifts smaller than δ per step are ignored).

    PURE WINDOW ALGEBRA — no UDF, no state: running mean, cumulative
    m, and the running min/max are all one ordered cumulative window
    per key, so the operator scales as a single sort-within-key pass.
    ``order_col`` must give a total order within each key (use a
    unique event id).

    ``quantize``: with the default None, m accumulates in raw
    doubles — fastest, but a long cumulative float sum is
    ACCUMULATION-ORDER-SENSITIVE, and window engines are free to add
    in tree order (measured: one ulp flip per ~10k rows between
    Spark's sequential and DuckDB's segment-tree accumulation).
    Passing e.g. ``quantize=6`` rounds each deviation term to that
    many decimals and accumulates it as an exact integer in 10^-q
    units — associative, order-free, bit-identical on every engine —
    at the cost of 10^-q per-term truncation (inconsequential next
    to any practical threshold). The contract query uses the
    quantized mode for hash-exactness.

    Returns every input row with (ph_inc, ph_dec, alarm)."""
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col).cast("double")
    step1 = df.select(
        *key_cols,
        order_col,
        x.alias("__x"),
        F.avg(x).over(w_cum).alias("__mu"),
    )
    term = F.col("__x") - F.col("__mu") - F.lit(delta)
    if quantize is None:
        step2 = step1.withColumn("__m", F.sum(term).over(w_cum))
        scale = 1.0
    else:
        scale = float(10 ** quantize)
        step2 = step1.withColumn(
            "__m",
            F.sum(F.round(term * scale).cast("long")).over(w_cum),
        )
    ph_inc = (F.col("__m") - F.min("__m").over(w_cum)) / F.lit(scale)
    ph_dec = (F.max("__m").over(w_cum) - F.col("__m")) / F.lit(scale)
    return step2.select(
        *key_cols,
        order_col,
        F.col("__x").alias(value_col),
        F.round(ph_inc, round_to).alias("ph_inc"),
        F.round(ph_dec, round_to).alias("ph_dec"),
        ((ph_inc > threshold) | (ph_dec > threshold)).alias("alarm"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    slack: float = 0.5,
    threshold: float = 5.0,
    round_stats: int | None = 6,
) -> DataFrame:
    """Tabular CUSUM mean-shift detection (Page's test, the
    monitoring classic): per key, standardized one-sided
    accumulators

        S+_t = max(0, S+_{t-1} + z_t - slack)
        S-_t = max(0, S-_{t-1} - z_t - slack)

    with z standardized by the key's own mean/stddev (one combinable
    aggregate, broadcast back), and ``is_change`` flagged where
    either side exceeds ``threshold``. Slack (the reference value K)
    absorbs noise; threshold (H) sets the ~ARL trade-off — the usual
    (0.5σ, 5σ) defaults detect a 1σ shift quickly while rarely
    false-alarming.

    The max(0, ...) clamp is a genuine recursion (no window
    rewrite), so both accumulators ride ``clamped_running_sum`` —
    the engine's sanctioned grouped recursion with fixed operand
    order, which is what lets the oracle replay the whole detector
    bit-exactly through recursive CTEs. ``round_stats`` rounds the
    standardized z inputs so cross-engine ulp differences in the
    mean/stddev aggregates cannot leak into the recursion."""
    g = list(key_cols)
    mu = F.avg(value_col)
    sd = F.stddev_samp(value_col)
    if round_stats is not None:
        # round the GROUP stats, not (only) per-row z: a last-ulp
        # cross-engine difference in mu/sd could straddle a per-row
        # rounding boundary on any of millions of rows, but on the
        # handful of group stats the collision budget is tiny — and
        # with identical mu/sd both engines compute bit-identical z
        mu, sd = F.round(mu, round_stats), F.round(sd, round_stats)
    stats = df.groupBy(*g).agg(mu.alias("__mu"), sd.alias("__sd"))
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sd")
    if round_stats is not None:
        z = F.round(z, round_stats)
    based = df.join(stats, g).withColumn("__z", z)
    pos = clamped_running_sum(
        based.withColumn("__d", F.col("__z") - F.lit(float(slack))),
        g,
        order_col,
        "__d",
        lo=0.0,
        hi=None,
        out_col="cusum_pos",
    )
    both = clamped_running_sum(
        pos.withColumn("__d", -F.col("__z") - F.lit(float(slack))),
        g,
        order_col,
        "__d",
        lo=0.0,
        hi=None,
        out_col="cusum_neg",
    )
    return both.drop("__mu", "__sd", "__z", "__d").withColumn(
        "is_change",
        (F.col("cusum_pos") > threshold) | (F.col("cusum_neg") > threshold),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    value_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Duration-weighted average of a piecewise-constant signal over
    calendar months: for each key and month, Σ value·overlap_days /
    Σ overlap_days, intervals half-open ``[start, end)``. The honest
    way to average anything carried on validity intervals (SCD2
    attributes, price periods, sensor holds) — a plain AVG
    over-weights short-lived rows.

    Scale shape: each interval explodes to the months it covers
    (explode factor = interval length in months — bounded by data
    semantics, not table size, and born co-located with the row), then
    ONE map-side-combinable aggregate on (keys, month). No window, no
    join. Degenerate ``start >= end`` intervals contribute nothing."""
    s, e = F.col(start_col), F.col(end_col)
    months = F.sequence(
        F.trunc(s, "month"),
        # last month with any coverage: end is EXCLUSIVE, so back the
        # boundary-landing end off by one day before truncating
        F.trunc(F.date_sub(e, 1), "month"),
        F.expr("INTERVAL 1 MONTH"),
    )
    rows = (
        df.filter(e > s)
        .select(
            *keys,
            s.alias("__s"),
            e.alias("__e"),
            F.col(value_col).cast("double").alias("__v"),
            F.explode(months).alias("month"),
        )
        .withColumn(
            "__ov",
            F.datediff(
                F.least(F.col("__e"), F.add_months(F.col("month"), 1)),
                F.greatest(F.col("__s"), F.col("month")),
            ),
        )
        .filter(F.col("__ov") > 0)
    )
    return rows.groupBy(*keys, "month").agg(
        F.sum("__ov").alias("covered_days"),
        F.round(
            F.sum(F.col("__v") * F.col("__ov")) / F.sum("__ov"), round_to
        ).alias("tw_avg"),
    )


def forecast_metrics(
    df: DataFrame,
    key_cols: list[str],
    actual_col: str,
    forecast_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-series forecast accuracy: MAE, RMSE, sMAPE (the
    scale-free symmetric percentage error — plain MAPE explodes on
    near-zero actuals), and bias (mean signed error). One combinable
    aggregate per key — the evaluation loop-closer for holt_linear /
    ewma the way ranking_eval closes retrieval. Rows where either
    side is NULL are skipped (count reported)."""
    a, f = F.col(actual_col), F.col(forecast_col)
    both = a.isNotNull() & f.isNotNull()
    err = F.when(both, f - a)
    smape_term = F.when(
        both,
        F.when(
            (F.abs(a) + F.abs(f)) == 0, F.lit(0.0)
        ).otherwise(2.0 * F.abs(f - a) / (F.abs(a) + F.abs(f))),
    )
    return df.groupBy(*key_cols).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.round(F.avg(F.abs(err)), round_to).alias("mae"),
        F.round(F.sqrt(F.avg(err * err)), round_to).alias("rmse"),
        F.round(F.avg(smape_term), round_to).alias("smape"),
        F.round(F.avg(err), round_to).alias("bias"),
    )


def cusum_control_chart(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    target: float,
    k: float,
    h: float,
) -> DataFrame:
    """Tabular CUSUM control chart (Page 1954): per key, in order,

    ``s_hi_t = max(0, s_hi_{t-1} + (x_t - target) - k)``
    ``s_lo_t = max(0, s_lo_{t-1} - (x_t - target) - k)``

    with an alarm when either statistic exceeds ``h``, after which
    that statistic resets to 0 (the classic restart so each shift is
    reported once). ``target`` is the in-control level and ``k`` the
    allowance (typically half the shift you want to detect), both in
    the value's own units — CUSUM monitors deviation from a DECLARED
    target, which also keeps the recursion free of sample-mean
    aggregates and therefore bit-replayable by the recursive-CTE
    oracle (same story as clamped_running_sum/q_ewma: fixed operand
    order, identical IEEE754 ops on identical operands).

    Output: input columns + ``cusum_hi``, ``cusum_lo``,
    ``alarm`` ('up' / 'down' / NULL). The clamp-and-reset makes this a
    genuine recursion (no window rewrite exists), so it takes the
    sanctioned grouped-map path: ONE shuffle on the key, a numpy loop
    per key — a million keys stream through independently; a single
    key's history is inherently sequential.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema_out = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("cusum_hi", T.DoubleType()),
            T.StructField("cusum_lo", T.DoubleType()),
            T.StructField("alarm", T.StringType()),
        ]
    )
    tgt, kf, hf = float(target), float(k), float(h)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(x)
        s_hi = np.empty(n)
        s_lo = np.empty(n)
        alarm = np.full(n, None, dtype=object)
        hi = lo = 0.0
        for i in range(n):
            if np.isnan(x[i]):
                # a NULL sample carries no deviation information:
                # emit the carried state untouched, never poison the
                # accumulators with NaN
                s_hi[i], s_lo[i] = hi, lo
                continue
            d = x[i] - tgt
            hi = max(0.0, hi + d - kf)
            lo = max(0.0, lo - d - kf)
            up, down = hi > hf, lo > hf
            if up and down:  # pathological h<=0: report the larger
                alarm[i] = "up" if hi >= lo else "down"
            elif up:
                alarm[i] = "up"
            elif down:
                alarm[i] = "down"
            s_hi[i], s_lo[i] = hi, lo
            if up:
                hi = 0.0
            if down:
                lo = 0.0
        pdf["cusum_hi"] = s_hi
        pdf["cusum_lo"] = s_lo
        pdf["alarm"] = alarm
        return pdf

    return _spread_by_key(df, key_cols).groupBy(*key_cols).applyInPandas(
        fn, schema=schema_out
    )


def grouped_ols(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary least squares y = a·x + b — the
    trend-per-tenant / drift-per-sensor primitive: one row per key
    with (slope, intercept, r2, n). NULL slope/r2 for degenerate
    groups (n < 2 or zero x-variance; r2 also NULL when y is
    constant).

    ONE combinable aggregate (six sums) per group — no window, no
    per-key sort, no Python; identical closed-form algebra to
    zipf_fit's corpus-level fit, grouped.

    NULL handling: pairwise deletion — a row with NULL in EITHER
    x or y contributes to none of the moments and not to n, so the
    fit is over complete pairs only (the moments stay mutually
    consistent; counting every row while the sums skipped NULLs
    silently skewed slope/intercept/r2)."""
    x0 = F.col(x_col).cast("double")
    y0 = F.col(y_col).cast("double")
    pair_ok = x0.isNotNull() & y0.isNotNull()
    x = F.when(pair_ok, x0)
    y = F.when(pair_ok, y0)
    agg = df.groupBy(*key_cols).agg(
        F.count(x).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return agg.select(
        *key_cols,
        F.when((n >= 2) & (varx > 0), F.round(slope, round_to)).alias(
            "slope"
        ),
        F.when(
            (n >= 2) & (varx > 0),
            F.round((sy - slope * sx) / n, round_to),
        ).alias("intercept"),
        F.when(
            (n >= 2) & (varx > 0) & (vary > 0),
            F.round((cov * cov) / (varx * vary), round_to),
        ).alias("r2"),
        n.cast("long").alias("n"),
    )
