"""Mergeable sketch aggregates: HyperLogLog distinct counts.

The scale story for COUNT(DISTINCT) at 100 TB: an exact distinct
count shuffles every distinct value; a Datasketches HLL sketch is a
fixed ~KB state that merges associatively, so each partition (or each
day, or each source shard) builds its own sketch and union-merge runs
over dimension-sized state — the same incremental-maintenance shape
as operators/incremental.py:merge_agg_states, but for cardinality.

Built on Spark 3.5+ ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (JVM Datasketches, codegen-friendly — no
Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch state over ``value_col`` — the partial,
    mergeable form (a ``sketch`` binary column). Persist this instead
    of raw distinct values; tomorrow's delta merges in without
    re-reading history. lg_k=12 → ~2% relative error, 4 KB/key."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_hll(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Union any number of per-key sketch states into one (same
    schema). Sketch union is the monoid merge — row traffic is
    |keys| x ~4 KB regardless of how much raw data built each state."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.hll_union_agg("sketch", F.lit(True)).alias("sketch")
    )


def hll_estimate(state: DataFrame, keys: list[str]) -> DataFrame:
    """Finalize: distinct-count estimate per key from the sketch."""
    return state.select(
        *keys, F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )


def approx_distinct_by(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One-shot per-key approximate distinct count via HLL — the
    single-pass form of the build/merge/estimate trio above. Unlike
    ``approx_count_distinct`` the intermediate state is exportable,
    which is what makes the incremental variant possible."""
    return hll_estimate(hll_sketches(df, keys, value_col, lg_k), keys)
