"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only state is a one-value watermark file
(``src/kafka_client/kafka_stream_data.py:21-45``). The engine
generalizes to arbitrary per-key streaming state with the PySpark
state API: state lives in the state store (checkpointed, partitioned
by key), timeouts bound its lifetime — the 100 TB-safe replacement
for driver-side bookkeeping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits one row per key per micro-batch with the cumulative totals —
    the canonical flatMapGroupsWithState shape (Scala-only in Spark
    3.x; PySpark exposes it as applyInPandasWithState).
    """
    out_schema = f"{key_col} bigint, n bigint, total double"
    state_schema = "n bigint, total double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def gap_sessions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Custom gap-based sessionization with an event-time timeout —
    the applyInPandasWithState counterpart of session_window for when
    the per-session output needs custom state (here: event count +
    bounds; in general: any accumulator the built-in window can't
    carry).

    State = the open session (start, last_seen, n). A micro-batch
    extends it while events fall within ``gap`` of last_seen,
    otherwise the closed session is EMITTED and a new one opens.
    The EventTimeTimeout + watermark close idle sessions even when a
    key never receives another event — without it, state for
    dead keys lives forever (the 100 TB failure mode). Emits only
    CLOSED sessions (append semantics)."""

    gap_ms = _duration_ms(gap)
    out_schema = (
        f"{key_col} bigint, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = "start timestamp, last_seen timestamp, n bigint"

    def update(key, pdfs, state: GroupState):
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last_seen, n = state.get
                closed.append((key[0], start, last_seen, n))
            state.remove()
        else:
            if state.exists:
                start, last_seen, n = state.get
            else:
                start = last_seen = None
                n = 0
            events = []
            for pdf in pdfs:
                events.extend(pdf[ts_col].dropna().tolist())
            if not events and last_seen is None:
                # A batch of only-null timestamps for a brand-new key:
                # nothing to track, and updating state would later call
                # .timestamp() on a None last_seen.
                return
            for ts in sorted(events):
                if last_seen is not None and (
                    (ts - last_seen).total_seconds() * 1000 > gap_ms
                ):
                    closed.append((key[0], start, last_seen, n))
                    start, n = ts, 0
                if start is None:
                    start = ts
                last_seen = ts
                n += 1
            state.update((start, last_seen, n))
            state.setTimeoutTimestamp(
                int(last_seen.timestamp() * 1000) + gap_ms
            )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key_col, "session_start", "session_end", "n_events"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_DURATION_MULT_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000,
}


def _duration_ms(s: str) -> int:
    parts = s.split()
    if len(parts) != 2 or parts[1] not in _DURATION_MULT_MS:
        raise ValueError(
            f"unsupported duration {s!r}: expected '<n> <unit>' with unit in "
            f"{sorted(set(_DURATION_MULT_MS))}"
        )
    return int(parts[0]) * _DURATION_MULT_MS[parts[1]]


def rate_limit(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    capacity: int = 10,
    refill_per_sec: float = 1.0,
) -> DataFrame:
    """Per-key token-bucket rate limiting / admission control over a
    stream: each key holds a bucket of at most ``capacity`` tokens
    refilling at ``refill_per_sec``; an event is ADMITTED when a
    token is available (bucket decremented) and marked throttled
    otherwise. The standard ingestion-protection primitive (API
    quotas, per-tenant fairness, crawler politeness) as a stateful
    streaming operator.

    Deterministic within a batch: events are processed in ``ts``
    order (tie-break preserves arrival order), refills computed from
    event-time deltas — so a replay of the same stream admits the
    same events (exactly-once friendly). Emits every event with
    ``admitted`` + the bucket level after the decision.

    State per key = (tokens, last_ts_ms): two scalars, bounded
    regardless of stream length — a million tenants cost two numbers
    each in the state store. Null timestamps are throttled outright
    (no refill can be computed). The key column keeps its incoming
    type (string tenant ids work, not just bigint)."""
    key_t = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_t}, {ts_col} timestamp, admitted boolean, "
        "tokens_left double"
    )
    state_schema = "tokens double, last_ms bigint"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            tokens, last_ms = state.get
        else:
            tokens, last_ms = float(capacity), None
        rows = []
        events = []
        for pdf in pdfs:
            for ts in pdf[ts_col]:
                events.append(ts)
        # ts order; NaT sorts to the front of pandas sorts — handle
        # them separately so refill arithmetic never sees NaT
        with_ts = sorted(
            (t for t in events if not pd.isna(t)), key=lambda t: t
        )
        for t in (t for t in events if pd.isna(t)):
            rows.append((key[0], None, False, float(tokens)))
        for t in with_ts:
            ms = int(t.value // 1_000_000)
            if last_ms is not None and ms > last_ms:
                tokens = min(
                    float(capacity),
                    tokens + (ms - last_ms) / 1000.0 * refill_per_sec,
                )
            last_ms = ms if last_ms is None else max(last_ms, ms)
            if tokens >= 1.0:
                tokens -= 1.0
                rows.append((key[0], t, True, float(tokens)))
            else:
                rows.append((key[0], t, False, float(tokens)))
        state.update((float(tokens), last_ms))
        yield pd.DataFrame(
            rows, columns=[key_col, ts_col, "admitted", "tokens_left"]
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially weighted moving average carried ACROSS
    micro-batches — the streaming twin of the batch
    timeseries.ewma (adjust=False recursion, identical operand
    order, so a drained stream matches the batch operator on the
    same data; pytest-proven). Events are folded in event-time order
    within a batch (ties by value for determinism); emits one row
    per INPUT event with the post-update ewma.

    State per key = (ewma, last_ts_ms): two scalars. Late events
    (before the carried last_ts) still fold — at-least-once
    semantics; pair with dropDuplicatesWithinWatermark upstream for
    exactly-once inputs. The key column keeps its incoming type
    (string tenant ids work, not just bigint)."""
    key_t = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_t}, {ts_col} timestamp, "
        f"{value_col} double, ewma double"
    )
    state_schema = "e double, last_ms bigint"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            e, last_ms = state.get
        else:
            e, last_ms = None, None
        rows = []
        events = []
        for pdf in pdfs:
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if not pd.isna(v):
                    events.append((ts, float(v)))
        events.sort(key=lambda t: (t[0].value, t[1]))
        for ts, v in events:
            e = v if e is None else alpha * v + (1.0 - alpha) * e
            last_ms = int(ts.value // 1_000_000)
            rows.append((key[0], ts, v, e))
        if e is not None:
            state.update((float(e), last_ms))
        yield pd.DataFrame(
            rows, columns=[key_col, ts_col, value_col, "ewma"]
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_page_hinkley(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    delta: float = 0.005,
    threshold: float = 50.0,
    quantize: int | None = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-key Page-Hinkley mean-shift monitor carried ACROSS
    micro-batches — the streaming twin of the batch
    timeseries.page_hinkley. State per key = five scalars
    (n, running value sum, cumulative m, running min m, running
    max m); events fold in event-time order within a batch (ties by
    value), and the running mean is accumulated ONE EVENT AT A TIME
    exactly like the batch window's sequential avg — so a drained
    stream is bit-identical to the batch operator on the same data
    in the quantized mode (the default here: quantize=6 accumulates
    m as exact integers in 10⁻⁶ units, associative and
    order-free — see the batch docstring for the float hazard it
    avoids). Emits one row per input event with
    (key, ts, value, ph_inc, ph_dec, alarm)."""
    key_t = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_t}, {ts_col} timestamp, {value_col} double, "
        "ph_inc double, ph_dec double, alarm boolean"
    )
    if quantize is None:
        state_schema = (
            "n bigint, sx double, m double, mmin double, mmax double"
        )
        scale = None
    else:
        state_schema = (
            "n bigint, sx double, m bigint, mmin bigint, mmax bigint"
        )
        scale = float(10 ** quantize)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, sx, m, mmin, mmax = state.get
        else:
            n, sx = 0, 0.0
            m = 0 if scale is not None else 0.0
            mmin = mmax = None
        events = []
        for pdf in pdfs:
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                if not pd.isna(v):
                    events.append((ts, float(v)))
        events.sort(key=lambda t: (t[0].value, t[1]))
        rows = []

        def spark_round0(x: float) -> int:
            # Spark F.round(double) is HALF_UP on the shortest
            # decimal repr; Python round() is half-to-even. Emulate
            # HALF_UP via Decimal on str(x) (str gives the same
            # shortest repr Java's Double.toString uses).
            import decimal

            return int(
                decimal.Decimal(repr(x)).quantize(
                    decimal.Decimal("1"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )

        for ts, v in events:
            n += 1
            sx += v
            mu = sx / n
            term = v - mu - delta
            if scale is not None:
                m += spark_round0(term * scale)
            else:
                m += term
            mmin = m if mmin is None else min(mmin, m)
            mmax = m if mmax is None else max(mmax, m)
            s = scale or 1.0
            ph_inc = (m - mmin) / s
            ph_dec = (mmax - m) / s
            rows.append(
                (
                    key[0],
                    ts,
                    v,
                    round(ph_inc, round_to),
                    round(ph_dec, round_to),
                    bool(ph_inc > threshold or ph_dec > threshold),
                )
            )
        if n:
            state.update((int(n), float(sx), m, mmin, mmax))
        yield pd.DataFrame(
            rows,
            columns=[
                key_col, ts_col, value_col, "ph_inc", "ph_dec", "alarm",
            ],
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
