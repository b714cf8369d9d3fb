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
