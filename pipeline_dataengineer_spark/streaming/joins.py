"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference's only join is the batch LEFT ANTI idempotence filter
inside foreachBatch (src/spark_pgsql/spark_streaming.py:80-84). These
wrappers add the two join shapes a continuous pipeline needs:

- stream x static dimension (enrichment): the static side is read per
  micro-batch; Spark broadcasts it when small. State-free.
- stream x stream within a time bound: both sides buffered in state,
  bounded by watermarks + the interval condition — without BOTH, the
  state store grows forever. The interval condition is what lets the
  state manager evict rows (Structured Streaming's documented
  requirement for stream-stream inner joins).

Like windows.py, each helper works identically on batch DataFrames
(that is how the oracle checks the join semantics) and streaming
ones — same logical plan either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a stream against a dimension table. State-free: each
    micro-batch joins against the static side's CURRENT contents (a
    re-read per batch for file sources — the fix for the reference's
    read-once anti-join bug, see operators/incremental.py). At scale
    broadcast the dimension; a shuffling stream-static join would
    re-shuffle every micro-batch."""
    right = F.broadcast(static) if broadcast_static else static
    return stream.join(right, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on a key where the right event lands in
    ``[left_ts - lower ... left_ts + upper]``.

    On streams both sides get watermarks (bounding buffered state) and
    the interval predicate gives the state manager an eviction bound;
    on batch the identical plan is a plain equi-join + range filter,
    which is how the contract oracle checks it. Columns must be
    disambiguated by the caller (alias before joining)."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return left.alias("l").join(right.alias("r"), cond, how)


def stream_stream_interval_anti_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Left events with NO matching right event in the interval — the
    "order never followed by a payment" / "view with no purchase"
    detector. Structured Streaming has no stream-stream anti join;
    the standard derivation is LEFT OUTER + IS NULL: the outer join
    emits an unmatched left row (with null right columns) only after
    the watermark proves no in-interval match can still arrive, so
    filtering on the null right key yields exactly the anti-join
    rows, each emitted exactly once, correctly delayed.

    On batch (neither side streaming) the SAME semantics run as a
    direct LEFT ANTI join on (key, interval-predicate): Catalyst's
    anti join short-circuits on first match and never materializes
    the matched pairs, where the left_outer+IS NULL derivation
    builds every (l, r) match only to throw it away — superlinear
    in the match count as data grows (the round-4 22× scale-tier
    anomaly traced to exactly this pair materialization). Streams
    keep the outer-join derivation (Structured Streaming has no
    stream-stream anti). Output columns: the LEFT side only,
    disambiguated as ``l.*``."""
    if not left.isStreaming and not right.isStreaming:
        cond = (
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (
                F.col(f"r.{right_ts}")
                >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
            )
            & (
                F.col(f"r.{right_ts}")
                <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
            )
        )
        return (
            left.alias("l")
            .join(right.alias("r"), cond, "left_anti")
            .select("l.*")
        )
    joined = stream_stream_interval_join(
        left,
        right,
        key,
        left_ts,
        right_ts,
        lower=lower,
        upper=upper,
        watermark=watermark,
        how="left_outer",
    )
    return joined.filter(F.col(f"r.{key}").isNull()).select("l.*")
