"""Streaming sinks: the reference's foreachBatch pattern, hardened.

The reference drains its Kafka topic once per day with
``writeStream.foreachBatch(...).trigger(once=True)``
(``src/spark_pgsql/spark_streaming.py:80-92``) and anti-joins against
a table snapshot read BEFORE the stream starts — correct only for a
single batch. Here: ``availableNow`` trigger (the maintained
replacement for ``once``) and the existing-key set is re-derived
inside every micro-batch, so a continuous run stays idempotent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pipeline_dataengineer_spark.operators.incremental import idempotent_append


def idempotent_foreach_batch(
    get_existing: Callable[[], DataFrame],
    keys: list[str],
    writer: Callable[[DataFrame], None],
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function that dedups each micro-batch,
    anti-joins it against the CURRENT sink keys (re-read per batch —
    the reference's read-once bug is the motivating counterexample),
    and appends survivors via `writer`."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        idempotent_append(
            batch_df,
            get_existing(),
            keys=keys,
            order_col=order_col,
            writer=writer,
        )

    return fn


def run_available_now(
    df: DataFrame,
    foreach_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Drain all available input once and stop — the reference's daily
    trigger(once=True) drain, with availableNow (rate-limitable,
    maintained) and a real checkpoint instead of a JSON state file."""
    return (
        df.writeStream.foreachBatch(foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
