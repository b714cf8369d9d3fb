"""Marketing-style conversion attribution over event streams.

Which touch (channel/event) gets credit for a conversion? The three
standard models, all pure window/aggregate plans over ONE shuffle on
the user key:

- **first-touch / last-touch**: per conversion event, the
  first/most-recent preceding non-conversion touch — `first`/`last`
  with ignorenulls over a PRECEDING-only frame (no future leakage,
  no self-attribution).
- **linear**: every touch in the journey (the run of events since
  the previous conversion) splits the conversion's credit equally.
  Journeys fall out of a cumulative count of conversions over the
  user window — the same gaps-and-islands move as sessionization —
  then credit = 1/journey-touch-count, aggregated per channel with
  one combinable pass.

At 100 TB these are one user-key shuffle each; journeys never
materialize driver-side and per-journey state is O(1) columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def touch_attribution(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    channel_col: str,
    is_conversion: Column,
) -> DataFrame:
    """One row per conversion event: input columns plus
    ``first_touch`` / ``last_touch`` (NULL when no touch precedes).
    Touches are the non-conversion events."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_channel = F.when(~is_conversion, F.col(channel_col))
    out = df.withColumn(
        "first_touch", F.first(touch_channel, ignorenulls=True).over(w)
    ).withColumn(
        "last_touch", F.last(touch_channel, ignorenulls=True).over(w)
    )
    return out.filter(is_conversion)


def linear_attribution(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    channel_col: str,
    is_conversion: Column,
) -> DataFrame:
    """(channel, credit): each conversion distributes 1.0 equally
    over the touches of its journey (events after the previous
    conversion, before this one). Journeys with zero touches drop
    their credit (no touch to blame — reported nowhere by design);
    touch runs that never convert earn nothing."""
    w_order = Window.partitionBy(*key_cols).orderBy(order_col)
    # journey id = number of conversions STRICTLY BEFORE this event:
    # a conversion closes its own journey, the next event starts a new
    # one. rowsBetween(…, -1) keeps the conversion with its journey.
    jid = F.coalesce(
        F.sum(is_conversion.cast("long")).over(
            w_order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    marked = df.withColumn("__jid", jid).withColumn(
        "__conv", is_conversion.cast("long")
    )
    journeys = marked.groupBy(*key_cols, "__jid").agg(
        F.sum(1 - F.col("__conv")).alias("__n_touch"),
        F.max("__conv").alias("__converted"),
    )
    credited = (
        marked.filter(~is_conversion)
        .join(journeys, [*key_cols, "__jid"])
        .filter((F.col("__converted") == 1) & (F.col("__n_touch") > 0))
        .withColumn("__credit", F.lit(1.0) / F.col("__n_touch"))
    )
    return (
        credited.groupBy(channel_col)
        .agg(F.round(F.sum("__credit"), 4).alias("credit"))
    )


def position_attribution(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    channel_col: str,
    is_conversion: Column,
    first_w: float = 0.4,
    last_w: float = 0.4,
) -> DataFrame:
    """U-shaped (position-based) attribution: first touch gets
    ``first_w``, last touch ``last_w``, middles split the remainder.
    One-touch journeys get full credit; two-touch journeys split
    first_w:last_w renormalized (the standard convention). Same
    journey framing and single key shuffle as linear_attribution."""
    w_order = Window.partitionBy(*key_cols).orderBy(order_col)
    jid = F.coalesce(
        F.sum(is_conversion.cast("long")).over(
            w_order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    marked = df.withColumn("__jid", jid).withColumn(
        "__conv", is_conversion.cast("long")
    )
    touches = marked.filter(~is_conversion).withColumn(
        "__pos",
        F.row_number().over(
            Window.partitionBy(*key_cols, "__jid").orderBy(order_col)
        ),
    )
    journeys = marked.groupBy(*key_cols, "__jid").agg(
        F.sum(1 - F.col("__conv")).alias("__n_touch"),
        F.max("__conv").alias("__converted"),
    )
    j = touches.join(journeys, [*key_cols, "__jid"]).filter(
        (F.col("__converted") == 1) & (F.col("__n_touch") > 0)
    )
    n = F.col("__n_touch")
    mid_w = 1.0 - first_w - last_w
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(
            n == 2,
            F.when(F.col("__pos") == 1, first_w / (first_w + last_w))
            .otherwise(last_w / (first_w + last_w)),
        )
        .when(F.col("__pos") == 1, F.lit(first_w))
        .when(F.col("__pos") == n, F.lit(last_w))
        .otherwise(F.lit(mid_w) / (n - 2))
    )
    return (
        j.withColumn("__credit", credit)
        .groupBy(channel_col)
        .agg(F.round(F.sum("__credit"), 4).alias("credit"))
    )


def time_decay_attribution(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    channel_col: str,
    is_conversion: Column,
    half_life_seconds: float = 7 * 86_400.0,
) -> DataFrame:
    """Time-decay attribution: each touch's raw weight is
    ``0.5 ^ (Δt / half_life)`` against its journey's conversion time,
    normalized within the journey so every converted journey pays out
    exactly 1.0. Recency-biased credit — the model ad platforms
    default to. ``ts_col`` must order events (drives both the journey
    framing and Δt)."""
    w_order = Window.partitionBy(*key_cols).orderBy(ts_col)
    jid = F.coalesce(
        F.sum(is_conversion.cast("long")).over(
            w_order.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    marked = df.withColumn("__jid", jid).withColumn(
        "__conv", is_conversion.cast("long")
    )
    conv_ts = F.max(
        F.when(F.col("__conv") == 1, F.col(ts_col).cast("double"))
    ).alias("__conv_ts")
    journeys = marked.groupBy(*key_cols, "__jid").agg(
        conv_ts, F.max("__conv").alias("__converted")
    )
    touches = (
        marked.filter(~is_conversion)
        .join(journeys, [*key_cols, "__jid"])
        .filter(F.col("__converted") == 1)
        .withColumn(
            "__w",
            F.pow(
                F.lit(0.5),
                (F.col("__conv_ts") - F.col(ts_col).cast("double"))
                / F.lit(half_life_seconds),
            ),
        )
    )
    norm = touches.groupBy(*key_cols, "__jid").agg(
        F.sum("__w").alias("__sw")
    )
    return (
        touches.join(norm, [*key_cols, "__jid"])
        .withColumn("__credit", F.col("__w") / F.col("__sw"))
        .groupBy(channel_col)
        .agg(F.round(F.sum("__credit"), 4).alias("credit"))
    )


def markov_attribution(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    channel_col: str,
    is_conversion: Column,
    round_to: int = 4,
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    model: journeys become paths through a first-order Markov chain
    (START → touches → CONV / DROP), and a channel's credit is its
    REMOVAL EFFECT — how much the chain's conversion probability
    falls when every transition through that channel is redirected to
    DROP — normalized over channels and scaled to total conversions.
    Unlike rule-based models (linear / U-shaped / decay), credit
    comes from observed path structure.

    Spark shape: journey framing + lag build the transition pairs in
    one key shuffle; transition COUNTS are a combinable aggregate
    whose size is (channels + 2)² — a model constant — and only that
    matrix reaches the driver, where the absorbing-chain probability
    is solved with numpy (|channels| ≤ hundreds; the corpus is never
    collected). Returns (channel, removal_effect, credit)."""
    import numpy as np

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
    jw = Window.partitionBy(*key_cols, "__jid").orderBy(order_col)
    # state sequence within a journey: touches keep their channel,
    # the conversion event closes with CONV; journeys without a
    # conversion close with DROP (added per journey below)
    seq = marked.withColumn(
        "__state",
        F.when(F.col("__conv") == 1, F.lit("__CONV__")).otherwise(
            F.col(channel_col).cast("string")
        ),
    ).withColumn("__prev", F.lag("__state").over(jw))
    inner = seq.select(
        F.coalesce("__prev", F.lit("__START__")).alias("src"),
        F.col("__state").alias("dst"),
    )
    # journey terminations without conversion -> DROP
    last = seq.groupBy(*key_cols, "__jid").agg(
        F.max_by("__state", F.col(order_col)).alias("src"),
        F.max("__conv").alias("__c"),
    )
    drops = last.filter(F.col("__c") == 0).select(
        "src", F.lit("__DROP__").alias("dst")
    )
    trans = (
        inner.unionByName(drops)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # driver-side absorbing chain: states = START + channels
    states = sorted(
        {r["src"] for r in trans if r["src"] not in ("__CONV__",)}
        | {r["dst"] for r in trans if r["dst"] not in ("__CONV__", "__DROP__")}
    )
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    counts = np.zeros((k, k + 2))  # cols: states..., CONV, DROP
    for r in trans:
        if r["src"] in ("__CONV__",):
            continue
        j = (
            k if r["dst"] == "__CONV__"
            else k + 1 if r["dst"] == "__DROP__"
            else idx[r["dst"]]
        )
        counts[idx[r["src"]], j] += r["n"]

    def conv_prob(blocked: str | None) -> float:
        c = counts.copy()
        if blocked is not None:
            b = idx[blocked]
            # transitions INTO the blocked channel become drops;
            # its own outgoing row is unreachable
            c[:, k + 1] += c[:, b]
            c[:, b] = 0
        tot = c.sum(axis=1, keepdims=True)
        tot[tot == 0] = 1.0
        p = c / tot
        Q, RC = p[:, :k], p[:, k]
        sol = np.linalg.solve(np.eye(k) - Q, RC)
        return float(sol[idx["__START__"]])

    base = conv_prob(None)
    channels = [s for s in states if s != "__START__"]
    effects = {
        ch: max(0.0, 1.0 - (conv_prob(ch) / base if base > 0 else 0.0))
        for ch in channels
    }
    total_eff = sum(effects.values()) or 1.0
    total_conv = counts[:, k].sum()
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                ch,
                round(float(effects[ch]), round_to),
                round(float(effects[ch] / total_eff * total_conv), round_to),
            )
            for ch in sorted(channels)
        ],
        f"{channel_col} string, removal_effect double, credit double",
    )


def shapley_attribution(
    df: DataFrame,
    user_col: str,
    channel_col: str,
    conversion_channel: str,
    max_channels: int = 16,
) -> DataFrame:
    """Exact Shapley-value channel attribution (Zhao et al. 2018,
    "Shapley Value Methods for Attribution Modeling"): the coalition
    value v(S) = conversions among users whose touched-channel set is
    contained in S, and each channel's credit is its exact Shapley
    value over that game — the only attribution scheme that is
    efficient, symmetric, and null-player-fair at once.

    Distributed part: ONE combinable aggregate per user (channel-set
    assembly + converted flag) and ONE channel-set-sized count table
    (≤ 2^k rows, k = distinct touch channels) — the facts never
    leave the executors. Driver part: subset-sum v(S) and the
    closed-form |S|!(k−1−|S|)!/k! weighted marginals over ≤ 2^k
    coalitions — a model constant, same contract as
    markov_attribution's transition matrix. Terms are accumulated in
    a DETERMINISTIC enumeration order (size, then lexicographic) so
    the generated-SQL oracle replays the float arithmetic exactly.

    Returns (channel, shapley) with Σ shapley = conversions credited
    to touches = v(C) − v(∅)."""
    from math import factorial

    per_user = df.groupBy(user_col).agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col(channel_col) != conversion_channel,
                        F.col(channel_col),
                    )
                )
            )
        ).alias("__set"),
        F.max(
            (F.col(channel_col) == conversion_channel).cast("int")
        ).alias("__conv"),
    )
    counts = {
        tuple(r["__set"]): r["n"]
        for r in per_user.filter(F.col("__conv") == 1)
        .groupBy("__set")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    channels = sorted({c for s in counts for c in s})
    k = len(channels)
    if k == 0:
        raise ValueError("no touch channels found on converting paths")
    if k > max_channels:
        raise ValueError(
            f"{k} channels > max_channels={max_channels}: exact "
            "Shapley is 2^k — group minor channels upstream"
        )

    def v(s: frozenset) -> int:
        return sum(n for t, n in counts.items() if set(t) <= s)

    def subsets(pool: list[str]):
        from itertools import combinations

        for size in range(len(pool) + 1):
            yield from combinations(pool, size)

    rows = []
    for c in channels:
        rest = [x for x in channels if x != c]
        phi = 0.0
        for s in subsets(rest):  # deterministic: size, then lex
            w = (
                factorial(len(s))
                * factorial(k - 1 - len(s))
                / factorial(k)
            )
            phi = phi + w * (
                v(frozenset(s) | {c}) - v(frozenset(s))
            )
        rows.append((c, phi))
    spark = df.sparkSession
    return spark.createDataFrame(rows, f"{channel_col} string, shapley double")
