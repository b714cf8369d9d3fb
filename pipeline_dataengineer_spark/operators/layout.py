"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group and file min/max statistics prune scans, but only
if the writer clustered rows so each file covers a small bounding box
of the filter columns. Sorting by a single column prunes only that
column; interleaving the bits of several columns (a Z-order / Morton
curve) gives every participating column locality, so multi-column
point/range filters skip most files.

The z-value is a pure JVM bit expression (shiftleft/bitwiseAND terms,
fused into one codegen projection); the layout step is ONE
repartitionByRange shuffle on the z-value plus an in-partition sort —
exactly the cost of a normal sorted write. Column bucketization uses
width_bucket against a broadcast 1-row min/max aggregate (the same
scalar-broadcast shape as TF-IDF's corpus size) — NO global window,
nothing single-task. Heavy skew degrades pruning quality, not
correctness; the upgrade is approx-quantile bucket boundaries in
place of uniform ones, with the interleave unchanged.

References (public): Morton 1966; Delta Lake OPTIMIZE ZORDER BY and
Iceberg sort-order docs describe the same construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 12) -> Column:
    """Morton-interleave the low ``bits`` bits of the given integer
    columns into one long. Pure codegen expression —
    ``bits * len(cols)`` shift/mask/or terms, no UDF, no shuffle.

    Inputs must be non-negative ints in [0, 2^bits); bucketize skewed
    or non-integer data first (``zorder_layout`` does)."""
    ncols = len(cols)
    if bits * ncols > 63:
        # JVM shiftleft masks the shift amount mod 64 — shifts >= 64
        # would silently wrap high interleave bits onto low positions
        # and corrupt the ordering instead of erroring.
        raise ValueError(
            f"zvalue: {ncols} cols x {bits} bits = {bits * ncols} "
            "interleave bits exceeds the 63 available in a signed "
            "long; lower `bits` (pruning granularity degrades "
            "gracefully) or split the column set."
        )
    terms = []
    for ci, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        for b in range(bits):
            # bit b of column ci lands at position b*ncols + ci:
            # already at position b, so shift by b*(ncols-1) + ci.
            src = col.bitwiseAND(F.lit(1 << b))
            terms.append(F.shiftleft(src, b * (ncols - 1) + ci))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z.cast("long")


def zorder_layout(
    df: DataFrame, cols: list[str], num_files: int, bits: int = 12
) -> DataFrame:
    """Re-cluster ``df`` along the Z-curve of ``cols`` so a
    partitioned write produces files whose min/max stats prune
    multi-column filters.

    Steps: uniform-bucketize each column to [0, 2^bits) via
    width_bucket against a broadcast min/max row, Morton-interleave,
    ONE repartitionByRange shuffle on the z-value, sort within
    partitions. Row content is unchanged — only physical order moves
    (the contract oracle for this operator is the identity query).

    Write with ``.write.parquet`` afterwards; each output task emits
    a file covering a compact z-range, i.e. a small bounding box in
    the original column space."""
    n_buckets = 1 << bits
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    ranked = df.join(F.broadcast(bounds))
    rank_cols = []
    for c in cols:
        name = f"__zb_{c}"
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        bucket = F.when(mx > mn,
            F.least(
                F.width_bucket(F.col(c).cast("double"), mn, mx, F.lit(n_buckets - 1))
                - 1,
                F.lit(n_buckets - 1),
            ),
        ).otherwise(F.lit(0))
        ranked = ranked.withColumn(name, bucket.cast("long"))
        rank_cols.append(name)
    z = zvalue(rank_cols, bits)
    drop = rank_cols + [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return (
        ranked.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *drop)
    )


def with_hilbert_index(
    df: DataFrame, x: str, y: str, out: str = "hilbert", order: int = 8
) -> DataFrame:
    """Hilbert-curve index of 2-D cells (x, y) ∈ [0, 2^order)² — the
    locality-preserving successor to the Z-curve: consecutive curve
    positions are always ADJACENT cells (Morton jumps across the
    plane at quadrant seams), so range scans over the layout touch
    tighter bounding boxes and prune better on both columns.

    The classic iterative quadrant-rotation walk (Hilbert 1891; the
    xy2d formulation popularized by Hacker's Delight) unrolled
    ``order`` times. Each round's (rx, ry, rotate) terms are NAMED
    intermediate columns: a single nested Column expression would
    duplicate the mutated x/y subtrees ~7× per round (7^order nodes —
    measured to hang Catalyst at order 8), while named non-cheap
    intermediates referenced more than once block CollapseProject, so
    the optimized plan stays a linear chain of thin projections —
    still pure codegen, no UDF, and exactly replayable as the
    generated-SQL oracle."""
    d = df.withColumn("__hx", F.col(x).cast("long")).withColumn(
        "__hy", F.col(y).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in reversed(range(order)):
        s = 1 << i
        d = d.withColumn(
            "__rx",
            F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0),
        ).withColumn(
            "__ry",
            F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0),
        )
        d = d.withColumn(
            out,
            F.col(out)
            + F.lit(s).cast("long")
            * F.lit(s)
            * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry")),
        )
        d = d.withColumn(
            "__fx",
            F.when(F.col("__rx") == 1, F.lit(s - 1) - F.col("__hx"))
            .otherwise(F.col("__hx")),
        ).withColumn(
            "__fy",
            F.when(F.col("__rx") == 1, F.lit(s - 1) - F.col("__hy"))
            .otherwise(F.col("__hy")),
        )
        d = d.withColumn(
            "__nhx",
            F.when(F.col("__ry") == 0, F.col("__fy")).otherwise(
                F.col("__hx")
            ),
        ).withColumn(
            "__nhy",
            F.when(F.col("__ry") == 0, F.col("__fx")).otherwise(
                F.col("__hy")
            ),
        )
        d = d.withColumn("__hx", F.col("__nhx")).withColumn(
            "__hy", F.col("__nhy")
        )
    return d.drop("__hx", "__hy", "__rx", "__ry", "__fx", "__fy",
                  "__nhx", "__nhy")


def hilbert_layout(
    df: DataFrame, cols: list[str], num_files: int, bits: int = 8
) -> DataFrame:
    """Two-column Hilbert re-clustering — same bucketize → index →
    repartitionByRange → in-partition sort recipe as zorder_layout,
    with the Hilbert index replacing Morton interleave (strictly
    better multi-column locality at identical shuffle cost; the
    rotation algebra is 2-D-specific, hence exactly two columns)."""
    if len(cols) != 2:
        raise ValueError("hilbert_layout is 2-D: pass exactly 2 cols")
    n_buckets = 1 << bits
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    ranked = df.join(F.broadcast(bounds))
    rank_cols = []
    for c in cols:
        name = f"__hb_{c}"
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        bucket = F.when(mx > mn,
            F.least(
                F.width_bucket(F.col(c).cast("double"), mn, mx, F.lit(n_buckets - 1))
                - 1,
                F.lit(n_buckets - 1),
            ),
        ).otherwise(F.lit(0))
        ranked = ranked.withColumn(name, bucket.cast("long"))
        rank_cols.append(name)
    indexed = with_hilbert_index(
        ranked, rank_cols[0], rank_cols[1], out="__h", order=bits
    )
    drop = rank_cols + [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return (
        indexed.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h", *drop)
    )
