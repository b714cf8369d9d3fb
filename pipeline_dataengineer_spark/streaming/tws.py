"""transformWithState custom stateful streaming (Spark 4 native API).

The successor to ``applyInPandasWithState``: a ``StatefulProcessor``
object with typed state handles (value/list/map state, timers)
instead of one opaque tuple — the API Spark 4 positions for
arbitrary stateful pipelines. This module carries the engine's
running-per-key-aggregate operator on that API, parity-matched to
``streaming/stateful.py:running_totals`` (the applyInPandasWithState
form) so the two stateful backends can be regression-checked against
each other on identical input.

Requires the RocksDB state store
(``spark.sql.streaming.stateStore.providerClass`` =
``...state.RocksDBStateStoreProvider`` — rocksdbjni ships in Spark's
jars). State is per-key and partition-local: Spark hash-partitions
the stream by the grouping key, so each key's state lives on exactly
one task and the operator scales horizontally with no coordination —
the same property the 100 TB design leans on everywhere else.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) across micro-batches.

    ValueState holds the two scalars; each batch folds its rows in
    pandas (vectorized — ``rows`` arrives as Arrow-backed DataFrames)
    and emits ONE updated row per key seen in the batch."""

    def __init__(self, key_name: str, value_col: str):
        self._key_name = key_name
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n LONG, total DOUBLE")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, total = self._state.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            v = pdf[self._value_col].dropna()
            n += int(len(v))
            total += float(v.sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {self._key_name: [key[0]], "n": [n], "total": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(
    stream_df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running (n, total) per key on the transformWithState API.
    Output schema/semantics identical to
    ``streaming/stateful.py:running_totals``; use outputMode
    'update' and the RocksDB state store provider. The key column
    keeps its incoming type (string keys work — the output schema is
    derived from the input, not hardcoded)."""
    from pyspark.sql import types as T

    key_field = stream_df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("n", T.LongType(), True),
            T.StructField("total", T.DoubleType(), True),
        ]
    )
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(key_col, value_col),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
