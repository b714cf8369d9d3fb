"""Windowed drift monitoring: PSI per event-time window against a
frozen reference distribution — the streaming face of
``operators/stats_tests.py:psi_drift``.

A model-serving or data-ingest feed drifts over TIME, so the
operational question is "PSI of the last hour vs the training
reference", re-evaluated every window. The reference side is frozen
once (its equal-frequency bin boundaries and bin proportions are a
2·n_bins-value broadcast — the psi_drift recipe); the live side is a
plain ``groupBy(window(ts), bin)`` count, which Structured Streaming
runs incrementally with watermark-bounded state. The SAME function
works on a batch frame (event-time backtest) and a streaming frame
(live monitor) — Spark's batch/streaming parity is the point.

Scale shape: no shuffle wider than (windows × bins) rows; the
reference never re-reads; the fact stream aggregates map-side into
≤ n_bins cells per window. State is bounded by the watermark.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FLOOR = 1e-6  # psi_drift's empty-bin floor, kept identical


def freeze_reference(
    ref: DataFrame, value_col: str, n_bins: int = 10
) -> tuple[list[float], list[float]]:
    """One pass over the reference: equal-frequency boundaries (exact
    interpolated percentiles, same as psi_drift) and the reference
    proportion per bin. Returns (boundaries, props) — 2·n_bins
    driver-side doubles, the whole broadcast state of the monitor."""
    qs = [i / n_bins for i in range(1, n_bins)]
    row = ref.filter(F.col(value_col).isNotNull()).agg(
        F.array(
            *[F.percentile(value_col, F.lit(q)) for q in qs]
        ).alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    bounds = [float(v) for v in row["b"]]
    n = int(row["n"])
    if n == 0:
        raise ValueError("freeze_reference: empty reference")
    # exact per-bin reference counts with the SAME bin rule the live
    # side uses (count of boundaries strictly below the value)
    ref_counts = (
        ref.filter(F.col(value_col).isNotNull())
        .groupBy(_bin_expr(F.col(value_col), bounds).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    props = [0.0] * n_bins
    for r in ref_counts:
        props[int(r["bin"])] = r["c"] / n
    return bounds, props


def _bin_expr(value: Column, bounds: list[float]) -> Column:
    """Bin index = number of boundaries strictly below the value —
    a linear when-chain (≤ n_bins terms, codegen-safe), identical to
    psi_drift's F.aggregate rule."""
    acc = F.lit(0)
    for b in bounds:
        acc = acc + F.when(value > F.lit(float(b)), 1).otherwise(0)
    return acc


def windowed_psi(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bounds: list[float],
    ref_props: list[float],
    window: str = "1 hour",
    watermark: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """PSI per event-time tumbling window vs the frozen reference:
    rows (window_start, window_end, psi, n). Works identically on
    batch and streaming inputs; pass ``watermark`` (e.g. "2 hours")
    on streams so window state is bounded and append mode can emit.

    PSI = Σ_bins (p_cur − p_ref)·ln(p_cur / p_ref) with psi_drift's
    1e-6 empty-bin floor on both sides — a backtest over a batch
    frame and the live monitor produce bit-identical scores."""
    n_bins = len(ref_props)
    src = df.filter(F.col(value_col).isNotNull())
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    # ONE stateful aggregation (n_bins conditional counts per
    # window) — a groupBy(window, bin) + regroup would be two chained
    # stateful operators, which Structured Streaming rejects as a
    # correctness hazard; the conditional-count form is also the
    # better plan (map-side combine straight to ≤ windows rows)
    b = _bin_expr(F.col(value_col), bounds)
    per_win = src.groupBy(
        F.window(F.col(ts_col), window).alias("__w")
    ).agg(
        *[
            F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__c{i}")
            for i in range(n_bins)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    psi = None
    for i in range(n_bins):
        q = max(float(ref_props[i]), _FLOOR)
        p = F.greatest(
            F.col(f"__c{i}").cast("double")
            / F.col("n").cast("double"),
            F.lit(_FLOOR),
        )
        term = (p - F.lit(q)) * F.log(p / F.lit(q))
        psi = term if psi is None else psi + term
    return per_win.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        F.round(psi, round_to).alias("psi"),
        F.col("n").cast("long").alias("n"),
    )


def windowed_js(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bounds: list[float],
    ref_props: list[float],
    window: str = "1 hour",
    watermark: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence per event-time window vs the frozen
    reference — the bounded companion to ``windowed_psi`` (JS ∈
    [0, ln 2] even on disjoint support, where PSI's floored log
    explodes; alert thresholds stay meaningful under novel bins).
    Same frozen-reference contract, same single stateful aggregation,
    same batch/streaming parity. Rows: (window_start, window_end,
    js_nats, n)."""
    n_bins = len(ref_props)
    src = df.filter(F.col(value_col).isNotNull())
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    b = _bin_expr(F.col(value_col), bounds)
    per_win = src.groupBy(
        F.window(F.col(ts_col), window).alias("__w")
    ).agg(
        *[
            F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__c{i}")
            for i in range(n_bins)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    js = None
    for i in range(n_bins):
        q = float(ref_props[i])
        p = F.col(f"__c{i}").cast("double") / F.col("n").cast("double")
        m = (p + F.lit(q)) / 2.0
        # 0·ln(0/x) ≡ 0: the p-side KL term is CASE-guarded; the
        # q-side is a Python-level branch (q is a driver constant)
        term_p = F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(0.0)
        if q > 0:
            term_q = F.lit(0.5 * q) * F.log(F.lit(q) / m)
        else:
            term_q = F.lit(0.0)
        term = term_p + term_q
        js = term if js is None else js + term
    return per_win.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        F.round(js, round_to).alias("js_nats"),
        F.col("n").cast("long").alias("n"),
    )


def windowed_ot(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bounds: list[float],
    ref_props: list[float],
    window: str = "1 hour",
    watermark: str | None = None,
    reg: float = 2.0,
    iterations: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Debiased Sinkhorn OT drift per event-time window vs the frozen
    reference — the cost-aware member of this monitor family (PSI/JS
    are bin-local; OT scores mass moved ONE bin differently from mass
    moved seven). Streaming face of
    ``operators/stats_tests.py:sinkhorn_drift``: same rational
    affinity kernel, same fixed iteration count, same debiased
    S(p,q) = OT(p,q) − OT(p,p)/2 − OT(q,q)/2 with p = frozen
    reference proportions and q = the window's live proportions.

    Plan shape: the ONE stateful aggregation (n_bins conditional
    counts per window — identical to windowed_psi) feeds a stateless
    Arrow kernel that runs the three scaling trajectories per window
    row with the SAME ordered-loop float arithmetic as the batch and
    grouped operators, so backtest (batch frame) and live monitor
    (stream) emit bit-identical scores and the unrolled SQL oracle
    replays them. Rows: (window_start, window_end, sinkhorn_div,
    transport_cost, n)."""
    from pyspark.sql.functions import pandas_udf

    n_bins = len(ref_props)
    if n_bins != len(bounds) + 1:
        raise ValueError("ref_props must have len(bounds)+1 entries")
    src = df.filter(F.col(value_col).isNotNull())
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    b = _bin_expr(F.col(value_col), bounds)
    per_win = src.groupBy(
        F.window(F.col(ts_col), window).alias("__w")
    ).agg(
        *[
            F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__c{i}")
            for i in range(n_bins)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    reg_f = float(reg)
    kern = [
        [
            1.0 / (1.0 + ((i - j) / reg_f) * ((i - j) / reg_f))
            for j in range(n_bins)
        ]
        for i in range(n_bins)
    ]
    p_ref = [float(x) for x in ref_props]

    def _scale(pp, qq):
        v = [1.0] * n_bins
        u = [0.0] * n_bins
        for _ in range(iterations):
            for i in range(n_bins):
                su = sum(kern[i][j] * v[j] for j in range(n_bins))
                u[i] = pp[i] / su if su else 0.0
            for j in range(n_bins):
                sv = sum(kern[i][j] * u[i] for i in range(n_bins))
                v[j] = qq[j] / sv if sv else 0.0
        pi = [
            [u[i] * kern[i][j] * v[j] for j in range(n_bins)]
            for i in range(n_bins)
        ]
        return sum(
            pi[i][j] * abs(i - j)
            for i in range(n_bins)
            for j in range(n_bins)
        )

    t_pp = _scale(p_ref, p_ref)  # window-independent: once, driver-side

    @pandas_udf("array<double>")
    def ot_kernel(packed: pd.Series) -> pd.Series:
        out = []
        for arr in packed:
            vals = [int(x) for x in arr]
            counts, tot = vals[:-1], vals[-1]
            if tot == 0:
                out.append([None, None])
                continue
            q = [c / tot for c in counts]
            t_pq = _scale(p_ref, q)
            t_qq = _scale(q, q)
            out.append([t_pq - 0.5 * t_pp - 0.5 * t_qq, t_pq])
        return pd.Series(out)

    scored = per_win.withColumn(
        "__ot",
        ot_kernel(
            F.array(
                *[F.col(f"__c{i}") for i in range(n_bins)], F.col("n")
            )
        ),
    )
    return scored.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        F.round(F.element_at("__ot", 1), round_to).alias("sinkhorn_div"),
        F.round(F.element_at("__ot", 2), round_to).alias("transport_cost"),
        F.col("n").cast("long").alias("n"),
    )
