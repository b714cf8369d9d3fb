"""Skew-mitigation operators.

AQE's skew-join splitting handles most runtime skew, but two shapes
still need explicit salting at 100 TB: (1) aggregation on a key whose
hot value overwhelms one reducer, and (2) a shuffle join against a
table with one pathological key. Both helpers produce results
IDENTICAL to the unsalted plan — the salt only reshapes the shuffle
— which is exactly what the oracle check asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    counts: str | None = None,
    salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates (sum/count):
    phase 1 groups on (keys + random-ish salt) so the hot key spreads
    over `salt` reducers; phase 2 re-aggregates the partials on the
    real keys. The salt is derived from a hash of the whole row via
    ``spark_partition_id``-free arithmetic so it is deterministic.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    phase1_aggs: list[Column] = [
        F.sum(src).alias(f"__p_{out}") for out, src in sums.items()
    ]
    if counts:
        phase1_aggs.append(F.count("*").alias("__p_cnt"))
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [F.sum(f"__p_{out}").alias(out) for out in sums]
    if counts:
        phase2_aggs.append(F.sum("__p_cnt").alias(counts))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: the big side gets a deterministic salt
    in [0, salt); the small side is exploded once per salt value, so
    the join key becomes (on, salt) and a hot key's rows spread over
    `salt` tasks. Row multiplicity is unchanged → results identical
    to the plain join."""
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)),
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_exploded, on=[on, "__salt"], how=how)
    return out.drop("__salt")
