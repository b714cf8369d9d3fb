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
    to the plain join.

    Join types where the SMALL side can emit unmatched rows
    (right/full outer) are rejected: an exploded small-side copy
    whose salt bucket happens to receive no big-side rows would emit
    a spurious null-extended row. Inner/left/semi/anti are safe (the
    exploded side never emits unmatched)."""
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross",
    ):
        raise ValueError(
            f"salted_join: how={how!r} can emit unmatched rows from the "
            "exploded small side (spurious null rows for salt buckets the "
            "hot key never hashed into); use the plain join for "
            "right/full outer."
        )
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)),
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_exploded, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def auto_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_key_threshold: int = 100_000,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hybrid skew join — the production pattern when only SOME keys
    are hot: detect heavy keys with one map-side-combinable count
    over the big side, then run the plain join for the cold keys and
    the salted join for the hot ones, union the halves. Cold rows
    (the vast majority) pay zero salting overhead — no explode
    multiplication of their dimension rows — while each hot key
    spreads over ``salt`` tasks instead of melting one reducer.

    The hot-key table is by definition tiny (keys with >threshold
    rows), so both the split filters and the salted join's small side
    use broadcasts. Results are IDENTICAL to the plain join (salting
    reshapes the shuffle, never multiplicity) — oracle-checked.

    At 100 TB prefer AQE's runtime skew splitting first
    (spark.sql.adaptive.skewJoin); reach for this when skew is known
    ahead of time (power-law web domains) or the join sits under an
    operator AQE can't split."""
    hot = (
        big.groupBy(on)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > hot_key_threshold)
        .select(on)
    )
    big_cold = big.join(F.broadcast(hot), on, "left_anti")
    big_hot = big.join(F.broadcast(hot), on, "left_semi")
    small_cold = small.join(F.broadcast(hot), on, "left_anti")
    small_hot = small.join(F.broadcast(hot), on, "left_semi")
    cold = big_cold.join(small_cold, on, how)
    hot_joined = salted_join(big_hot, small_hot, on, salt=salt, how=how)
    return cold.unionByName(hot_joined)
