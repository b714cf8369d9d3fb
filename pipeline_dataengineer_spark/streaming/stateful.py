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
