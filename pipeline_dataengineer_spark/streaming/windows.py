"""Event-time window aggregations, batch/stream agnostic.

The reference has no windowed aggregation (its only time logic is the
daily watermark file); these are the engine's streaming-native
generalization. Each helper works identically on a batch DataFrame
(for oracle checking) and a streaming DataFrame (with watermark) —
same logical plan, which is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Non-overlapping event-time windows. On a stream the watermark
    bounds state; on batch it is a plain groupBy — one shuffle on
    (window, *group_cols)."""
    df = _with_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration)] + [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*keys).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Overlapping windows — each row lands in duration/slide windows,
    which multiplies shuffle volume by that factor; keep the ratio
    small at scale."""
    df = _with_watermark(df, ts_col, watermark)
    keys = [F.window(ts_col, duration, slide)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return df.groupBy(*keys).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str | Column,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Gap-based session windows (``session_window``). ``gap`` may be
    a static duration string OR a Column producing a per-row interval
    ("dynamic gap": e.g. longer idle allowance for checkout events
    than for page views) — each event extends its session to
    ``[ts, ts + gap(row))`` and overlapping extents merge. Batch-mode
    equivalent for oracle checks: running-max interval merge (see
    contract q_session_window / q_session_dynamic_gap)."""
    df = _with_watermark(df, ts_col, watermark)
    keys = [F.session_window(ts_col, gap)] + [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*keys).agg(*aggs)
