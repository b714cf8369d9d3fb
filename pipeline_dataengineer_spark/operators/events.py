"""Event-analytics operators: funnels and cohort retention.

The reference's event flow is ingest-only (REST → Kafka → Postgres,
no analytics on top); these are the standard product-analytics reads
a pipeline serves once events land. Both are single-aggregation
shapes: one shuffle on the entity key, conditional aggregates inside
— no self-joins per funnel step (the naive k-step funnel as k-1
self-joins shuffles the event table k times; this shuffles it once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    order_col: str,
    steps: list[str],
) -> DataFrame:
    """First-touch ordered funnel: an entity reaches step k when the
    FIRST occurrence of each step strictly follows the first
    occurrence of the previous step (the standard one-pass funnel
    simplification; a re-click after a later view does not resurrect
    a broken order). Returns (step, step_idx, n_entities).

    One groupBy on the entity computes every step's first-occurrence
    order via min(CASE...) conditional aggregates, the in-order chain
    is a narrow column expression on the aggregate output, and the
    per-step reach is a single-row final aggregate — the event table
    shuffles ONCE regardless of funnel depth (the naive k-step funnel
    as k-1 self-joins shuffles it k times)."""
    base = df.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        F.col(order_col).alias("__o"),
    )
    # first-occurrence time of each step type per entity
    per_entity = base.groupBy("__e").agg(
        *[
            F.min(F.when(F.col("__t") == s, F.col("__o"))).alias(f"__first_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # in-order reach: step i counts only if its first occurrence is
    # strictly after step i-1's reach time. Build the chain as columns.
    reach_cols: list[Column] = [F.col("__first_0")]
    for i in range(1, len(steps)):
        prev = reach_cols[i - 1]
        cur = F.col(f"__first_{i}")
        reach_cols.append(
            F.when(prev.isNotNull() & cur.isNotNull() & (cur > prev), cur)
        )
    tagged = per_entity.select(
        *[reach_cols[i].alias(f"__reach_{i}") for i in range(len(steps))]
    )
    counts = tagged.agg(
        *[
            F.count(F.col(f"__reach_{i}")).alias(f"__n_{i}")
            for i in range(len(steps))
        ]
    )
    per_step = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"),
                F.lit(i).cast("long").alias("step_idx"),
                F.col(f"__n_{i}").alias("n_entities"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(per_step).alias("f")).select("f.*")


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: entities grouped by their first
    active period; for each (cohort, periods_since) count how many
    came back. Returns (cohort, period_n, n_active).

    Two aggregates: first-period per entity (shuffle on entity), then
    (cohort, period) counts after a broadcast-size join of the
    per-entity cohort back onto the entity's active periods — the
    cohort map is one row per entity, which at 100 TB co-partitions
    with the activity aggregate on the entity key (both shuffles hash
    the same column, so the join itself is exchange-free)."""
    if period not in ("day", "week", "month"):
        raise ValueError(
            f"cohort_retention: period must be 'day', 'week' or 'month', got {period!r}"
        )
    active = df.select(
        F.col(entity_col).alias("__e"),
        F.date_trunc(period, F.col(ts_col)).alias("__p"),
    ).distinct()
    first = active.groupBy("__e").agg(F.min("__p").alias("__cohort"))
    joined = active.join(first, "__e")
    if period == "month":
        # datediff/30 would drift; month-truncated timestamps differ
        # by an exact whole number of months.
        period_n = F.months_between(F.col("__p"), F.col("__cohort")).cast("long")
    else:
        period_n = (
            F.datediff(F.col("__p"), F.col("__cohort"))
            / F.lit(7 if period == "week" else 1)
        ).cast("long")
    return (
        joined.select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort"),
            period_n.alias("period_n"),
            F.col("__e"),
        )
        .groupBy("cohort", "period_n")
        .agg(F.count("*").alias("n_active"))
    )


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): one session row per
    run of events where consecutive gaps are <= gap_seconds. Batch
    parity of streaming/stateful.py:gap_sessions — the session
    boundaries are identical, so the stateful operator can be
    regression-checked against this plan on the same data.

    One shuffle on the entity; the session id is a running sum of
    gap-break flags (lag + cumsum), the per-session stats one further
    partial+final aggregate keyed by (entity, session) which reuses
    the entity partitioning."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    # Timestamp subtraction (a day-time interval in Spark 4) works for
    # both TIMESTAMP and TIMESTAMP_NTZ columns; casting NTZ to double
    # is a DATATYPE_MISMATCH error, so the gap compares intervals.
    gap_break = (
        F.when(
            F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
            > F.expr(f"make_dt_interval(0, 0, 0, {gap_seconds})"),
            1,
        )
        .otherwise(0)
    )
    with_session = df.withColumn(
        "__sess",
        F.sum(gap_break).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_session.groupBy(entity_col, "__sess").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("__sess")


def debounce(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tolerance: float,
) -> DataFrame:
    """Drop events that fire within ``tolerance`` of the PREVIOUS
    event of the same key — sensor/UI debouncing (duplicate webhook
    deliveries, double-clicks, chattering monitors). Lag semantics:
    an event is dropped iff its immediate same-key predecessor is
    closer than ``tolerance`` — a pure window formulation (one
    shuffle, no sequential scan-state), which thins a burst to its
    spaced-out survivors. (The alternative "relative to the last
    KEPT event" is inherently sequential — that recursion lives in
    the CEP/stateful-streaming operators, not here.)

    The batch twin of streaming/dedup.py's watermark
    deduplication."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    prev = F.lag(F.col(order_col).cast("double")).over(w)
    keep = prev.isNull() | (
        (F.col(order_col).cast("double") - prev) > tolerance
    )
    return df.withColumn("__keep", keep).filter("__keep").drop("__keep")


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    window_days: int = 7,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing-window distinct entities per day — "7-day active
    users": for each day, the EXACT count of distinct entities seen
    in [day − window + 1, day]. COUNT(DISTINCT) is not a legal window
    function, and buffering per-day entity sets in window state is
    the memory bomb; the scalable formulation is contribution
    explode: dedup to (entity, day) first (one combinable aggregate —
    this bounds everything downstream by ACTIVE entity-days, not raw
    events), explode each to the ``window_days`` target days it
    contributes to (a bounded fan-out riding the scan), and one
    count-distinct aggregate per (group, target day).

    Returns (group_cols…, day, n_distinct). Days with no activity in
    range produce no row (left-join a spine for gap fill)."""
    g = list(group_cols or [])
    day = F.to_date(F.col(ts_col))
    active = (
        df.select(*g, F.col(entity_col).alias("__e"), day.alias("__d"))
        .distinct()
    )
    targets = F.explode(
        F.sequence(
            F.col("__d"),
            F.date_add(F.col("__d"), window_days - 1),
            F.expr("INTERVAL 1 DAY"),
        )
    )
    contrib = active.select(*g, "__e", targets.alias("day"))
    return contrib.groupBy(*g, "day").agg(
        F.count_distinct("__e").alias("n_distinct")
    )


def funnel_windowed(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    order_col: str,
    steps: list[str],
    max_span: float,
) -> DataFrame:
    """``funnel`` with a CONVERSION WINDOW: step k counts only when
    it also lands within ``max_span`` of the funnel's step-1 time
    ("signed up, then purchased within 7 days" — without the bound,
    a purchase three years later still 'converts', which is never
    what growth analysis means). ``max_span`` is in ``order_col``
    units. Same single-shuffle shape as ``funnel``: one conditional-
    aggregate pass per entity, chain + window test as narrow column
    expressions, one final per-step count."""
    base = df.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        F.col(order_col).alias("__o"),
    )
    per_entity = base.groupBy("__e").agg(
        *[
            F.min(F.when(F.col("__t") == s, F.col("__o"))).alias(f"__first_{i}")
            for i, s in enumerate(steps)
        ]
    )
    reach_cols: list[Column] = [F.col("__first_0")]
    for i in range(1, len(steps)):
        prev = reach_cols[i - 1]
        cur = F.col(f"__first_{i}")
        reach_cols.append(
            F.when(
                prev.isNotNull()
                & cur.isNotNull()
                & (cur > prev)
                & (cur - F.col("__first_0") <= max_span),
                cur,
            )
        )
    tagged = per_entity.select(
        *[r.alias(f"__reach_{i}") for i, r in enumerate(reach_cols)]
    )
    counts = tagged.agg(
        *[
            F.count(F.col(f"__reach_{i}")).alias(f"__n_{i}")
            for i in range(len(steps))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("step"),
                        F.lit(i + 1).alias("step_idx"),
                        F.col(f"__n_{i}").alias("n_entities"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step", "r.step_idx", "r.n_entities")


def funnel_step_times(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    order_col: str,
    steps: list[str],
    round_to: int = 4,
) -> DataFrame:
    """Time-to-convert distribution between consecutive funnel steps:
    for each step transition, the count of entities that made it
    in-order plus the exact median and p90 of the gap — the "where
    does the funnel stall" diagnostic. Same single-shuffle
    conditional-aggregate frame as ``funnel``; the quantiles run over
    step-pair-sized columns of the per-entity table."""
    base = df.select(
        F.col(entity_col).alias("__e"),
        F.col(type_col).alias("__t"),
        F.col(order_col).alias("__o"),
    )
    per_entity = base.groupBy("__e").agg(
        *[
            F.min(F.when(F.col("__t") == s, F.col("__o"))).alias(f"__first_{i}")
            for i, s in enumerate(steps)
        ]
    )
    reach: list[Column] = [F.col("__first_0")]
    for i in range(1, len(steps)):
        prev = reach[i - 1]
        cur = F.col(f"__first_{i}")
        reach.append(F.when(prev.isNotNull() & cur.isNotNull() & (cur > prev), cur))
    tagged = per_entity.select(
        *[r.alias(f"__r{i}") for i, r in enumerate(reach)]
    )
    gaps = tagged.select(
        *[
            (F.col(f"__r{i}") - F.col(f"__r{i-1}")).alias(f"__g{i}")
            for i in range(1, len(steps))
        ]
    )
    agg = gaps.agg(
        *[
            a
            for i in range(1, len(steps))
            for a in (
                F.count(F.col(f"__g{i}")).alias(f"__n{i}"),
                F.round(
                    F.percentile(F.col(f"__g{i}"), F.lit(0.5)), round_to
                ).alias(f"__p50_{i}"),
                F.round(
                    F.percentile(F.col(f"__g{i}"), F.lit(0.9)), round_to
                ).alias(f"__p90_{i}"),
            )
        ]
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{steps[i-1]}->{steps[i]}").alias("transition"),
                        F.lit(i).alias("step_idx"),
                        F.col(f"__n{i}").alias("n_entities"),
                        F.col(f"__p50_{i}").alias("p50_gap"),
                        F.col(f"__p90_{i}").alias("p90_gap"),
                    )
                    for i in range(1, len(steps))
                ]
            )
        ).alias("r")
    )
    return rows.select("r.*")


def top_paths(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    channel_col: str,
    is_conversion: Column,
    top_n: int = 20,
) -> DataFrame:
    """Most common converting paths: each converted journey's ordered
    touch sequence collapsed to a '>'-joined path string, counted,
    top-N by frequency (deterministic tie-break on the path). One key
    shuffle frames journeys; path assembly is the ordered-struct
    sort_array groupBy; the count table is path-cardinality-sized."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    jid = F.coalesce(
        F.sum(is_conversion.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    marked = df.withColumn("__jid", jid).withColumn(
        "__conv", is_conversion.cast("long")
    )
    per_j = marked.groupBy(*key_cols, "__jid").agg(
        F.array_join(
            F.expr(
                f"transform(sort_array(collect_list(CASE WHEN __conv = 0 "
                f"THEN struct({order_col} AS o, {channel_col} AS c) END)), "
                "x -> x.c)"
            ),
            ">",
        ).alias("path"),
        F.max("__conv").alias("__c"),
    )
    return (
        per_j.filter((F.col("__c") == 1) & (F.col("path") != ""))
        .groupBy("path")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.col("n_journeys").desc(), F.col("path").asc())
        .limit(top_n)
    )


def frequent_sequences(
    df: DataFrame,
    user_col: str,
    order_col: str,
    event_col: str,
    n: int = 3,
    min_support: int = 2,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Frequent contiguous event n-grams across users (the workhorse
    cut of sequential-pattern mining: which length-n click/action
    chains recur?): per user, order events and slide a window of n
    consecutive event types; count each distinct sequence across the
    corpus and keep those with ``count >= min_support``.

    Output: (seq array<string>, n_occurrences, n_users) ordered by
    nothing (callers sort). ``tiebreak_col`` disambiguates equal
    timestamps deterministically (defaults to the event column
    itself so reruns and engines agree).

    Plan: ONE shuffle to sort each user's history (window lead),
    then a combinable groupBy on the n-gram — counts partial-agg
    map-side, and the result is pattern-cardinality-sized, never
    fact-sized. n is a literal: the n-gram assembly is a fused
    array() projection, no explode blow-up."""
    if n < 1:
        raise ValueError("n must be >= 1")
    tb = tiebreak_col or event_col
    w = Window.partitionBy(user_col).orderBy(order_col, tb)
    parts = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    grams = df.select(
        F.col(user_col).alias("__u"),
        F.array(*parts).alias("seq"),
    ).filter(~F.exists(F.col("seq"), lambda x: x.isNull()))
    return (
        grams.groupBy("seq")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("__u").alias("n_users"),
        )
        .filter(F.col("n_occurrences") >= min_support)
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    period: str = "month",
    round_to: int = 6,
) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by their FIRST
    activity period (the cohort), revenue accumulated by cohort age —
    one row per (cohort, age) with (n_users, period_value,
    cum_value, ltv_per_user = cumulative value / cohort size). The
    payback-curve complement of cohort_retention.

    Scale: first-period per user is one combinable min aggregate
    joined back (broadcast when user-bounded, hash otherwise);
    (cohort, age) cells aggregate combinably; the cumulative window
    runs over the cohort×age cell table only."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be 'day', 'week' or 'month'")
    def trunc(col):
        d = col.cast("date")
        # F.trunc has no 'day' unit (it returns NULL) — a date IS
        # already day-truncated
        return d if period == "day" else F.trunc(d, period)

    first = df.groupBy(user_col).agg(
        trunc(F.min(F.col(ts_col))).alias("cohort")
    )
    tagged = df.join(first, user_col)
    p_trunc = trunc(F.col(ts_col))
    if period == "month":
        age = F.months_between(p_trunc, F.col("cohort")).cast("int")
    elif period == "week":
        age = (F.datediff(p_trunc, F.col("cohort")) / 7).cast("int")
    else:
        age = F.datediff(p_trunc, F.col("cohort")).cast("int")
    cells = tagged.groupBy("cohort", age.alias("age")).agg(
        F.sum(F.col(value_col)).alias("period_value")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = cells.join(F.broadcast(sizes), "cohort").withColumn(
        "cum_value", F.sum("period_value").over(w)
    )
    return out.select(
        "cohort",
        "age",
        F.col("n_users").cast("long").alias("n_users"),
        F.round("period_value", round_to).alias("period_value"),
        F.round("cum_value", round_to).alias("cum_value"),
        F.round(
            F.col("cum_value") / F.col("n_users"), round_to
        ).alias("ltv_per_user"),
    )
