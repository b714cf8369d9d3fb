"""Global total-order utilities: distributed row indexing and
sorted-neighborhood blocking.

``row_number() OVER (ORDER BY ...)`` with no partition key funnels
the whole table through ONE task — the canonical scale bug (Spark
itself warns). The distributed answer is the classic two-phase
global index:

1. range-repartition + sort within partitions on the order key
   (Spark's own distributed sort — no single-task stage anywhere);
2. count rows per partition (a partition-count-sized aggregate),
   broadcast the cumulative offsets, and add each partition's offset
   to its local running index (mapInPandas with a per-partition
   counter).

The result is the exact global 0-based index of the total order
``order_cols`` (callers must make the order total — include a
tie-break id), computed with nothing but partition-sized state.

Sorted-neighborhood blocking (the other classic ER blocking besides
FastSS edit-distance and LSH): sort records by a blocking key and
compare only rows within ``window`` positions. Pair generation from
the index is an equi-join on ``floor(idx / window)`` plus the
adjacent block, with the exact ``|i−j| <= window`` residual — every
qualifying pair meets in exactly one block, no quadratic join, hot
blocks are ordinary AQE-splittable skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def global_row_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "row_index",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the exact 0-based position of each row in the total order
    ``order_cols`` (which must be unique per row — include an id)."""
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(
        n_part, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*order_cols)
    # localCheckpoint: the partition-size pass and the indexing pass
    # MUST see the same partitioning, but repartitionByRange samples
    # its boundaries with an RDD-id-derived seed — recomputing it per
    # action can shift rows across partitions and corrupt the offsets
    # (observed: permuted indices under a second evaluation). The
    # checkpoint pins one materialized partitioning for both passes.
    with_pid = ordered.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()

    schema_out = T.StructType(
        list(with_pid.schema.fields)
        + [T.StructField("__local_idx", T.LongType())]
    )

    def local_index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas sees each PARTITION as a batch iterator: keep a
        # running counter across batches so the index is partition-local
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__local_idx"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    indexed = with_pid.mapInPandas(local_index, schema_out)
    # partition sizes -> cumulative offsets (partition-count-sized)
    sizes = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], ["__pid", "__off"]
    )
    return (
        indexed.join(F.broadcast(off_df), "__pid")
        .withColumn(index_col, F.col("__local_idx") + F.col("__off"))
        .drop("__pid", "__local_idx", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key,
    window: int = 5,
    key_col_name: str = "__snm_key",
) -> DataFrame:
    """Candidate pairs (id_a, id_b) with id_a's sort position within
    ``window`` of id_b's (id_a ordered before id_b). ``sort_key`` is
    a Column (e.g. a normalized name prefix); ties order by id so
    the order is total."""
    keyed = df.select(F.col(id_col), sort_key.alias(key_col_name))
    idx = global_row_index(keyed, [key_col_name, id_col], "__idx")
    a = idx.select(
        F.col(id_col).alias("id_a"),
        F.col("__idx").alias("__ia"),
        F.floor(F.col("__idx") / window).alias("__blk"),
    )
    b_base = idx.select(
        F.col(id_col).alias("id_b"), F.col("__idx").alias("__ib")
    )
    # each left row probes its own block and the next one; each
    # qualifying pair (ia < ib <= ia+window) meets exactly once
    # because ib - ia <= window spans at most two window-blocks
    b = b_base.withColumn("__blk", F.floor(F.col("__ib") / window)).union(
        b_base.withColumn(
            "__blk", F.floor(F.col("__ib") / window) - 1
        )
    )
    return (
        a.join(b, "__blk")
        .filter(
            (F.col("__ib") > F.col("__ia"))
            & (F.col("__ib") - F.col("__ia") <= window)
        )
        .select("id_a", "id_b")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    index_col: str = "shuffle_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Layout-independent pseudorandom permutation — the "shuffle the
    corpus before training" step. Each row's position is its rank in
    ``(portable_scramble(id), id)`` order, so the permutation is a pure
    function of the ids: re-running on a repartitioned, re-sorted, or
    re-written copy of the data yields the SAME order (unlike
    ``ORDER BY rand()``, which is neither reproducible nor stable
    under retries — a lineage recompute of a failed task would
    permute differently mid-job).

    The rank is computed by ``global_row_index``'s two-phase
    distributed sort — no single-task window anywhere. Writing the
    result partitioned by ``floor(shuffle_pos / shard_size)`` gives
    reproducible training shards."""
    from pipeline_dataengineer_spark.operators.sampling import portable_scramble

    key = portable_scramble(F.col(id_col))
    return global_row_index(
        df.withColumn("__shuffle_key", key),
        ["__shuffle_key", id_col],
        index_col=index_col,
        num_partitions=num_partitions,
    ).drop("__shuffle_key")
