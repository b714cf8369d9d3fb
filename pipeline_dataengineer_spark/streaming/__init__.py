"""Structured Streaming wrappers: windows, dedup, idempotent sinks."""

from pipeline_dataengineer_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
)
from pipeline_dataengineer_spark.streaming.sinks import (
    idempotent_foreach_batch,
    run_available_now,
)
from pipeline_dataengineer_spark.streaming.dedup import streaming_dedup

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "idempotent_foreach_batch",
    "run_available_now",
    "streaming_dedup",
]
