"""Join helpers beyond the built-in equi-join surface.

The reference's only join is a LEFT ANTI equi-join
(``src/spark_pgsql/spark_streaming.py:82-84``); vanilla joins need no
wrapper (``df.join`` + Catalyst strategy selection). This module adds
the shapes Spark lacks natives for: as-of join and a bucketized range
join, plus a size-gated broadcast helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_if_small(df: DataFrame, max_rows: int = 1_000_000) -> DataFrame:
    """Broadcast only under an explicit row-count gate.

    At cluster scale a blind ``F.broadcast`` on a 'small' side that
    turned out to be 50 GB OOMs every executor; counting first costs
    one cheap job on a dimension table. (AQE also auto-broadcasts
    under spark.sql.autoBroadcastJoinThreshold; this is the explicit
    variant for when the caller knows better.)
    """
    return F.broadcast(df) if df.count() <= max_rows else df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (direction='backward'; 'forward' = earliest
    right_ts >= left_ts), matching on the `on` key.

    No native Spark operator → union both sides tagged, sort within
    the key partition by (ts, side), and carry the last-seen right row
    forward with a window ``last(ignorenulls=True)``. ONE shuffle on
    the key (the window), no range explosion — the scalable shape.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(right.select(F.struct(*rcols).alias("s")).schema["s"].dataType).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*lcols).alias("s")).schema["s"].dataType).alias("__l"),
        F.struct(*rcols).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    out_cols = [F.col("__l")[c].alias(c) for c in lcols] + [
        F.col("__m")[c].alias(c) for c in rcols
    ]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join without the cross-product trap.

    Naive ``l.point between r.lo and r.hi`` is a broadcast-nested-loop
    at scale. Bucketize: explode each right interval into the integer
    buckets it overlaps, bucket the left point, equi-join on bucket,
    then apply the exact range predicate. Shuffle is on the bucket key
    → sort-merge/hash join, not BNLJ.
    """
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    cond = (
        (lb["__bucket"] == rb["__bucket"])
        & (lb[left_point] >= rb[right_lo])
        & (lb[left_point] <= rb[right_hi])
    )
    return lb.join(rb, cond, how).drop("__bucket")
