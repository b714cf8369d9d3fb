"""Join pruning: filter a huge fact side BEFORE its shuffle using a
tiny digest of the other side's keys.

The 100-TB semi-join problem: ``big.join(small, key, "left_semi")``
shuffles ALL of big on the key even when only 1% of its rows can
match. Engines solve this with runtime bloom filters (Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects one when
stats warrant); this operator is the EXPLICIT, deterministic version
of the same plan shape, built from exact primitives:

1. digest the small side's keys into distinct hash buckets
   (``xxhash64 % num_buckets`` — bounded by min(num_buckets, |keys|)
   rows, a few MB at the default 2^20);
2. broadcast-semi-join big against the digest on the bucket column —
   a map-side filter, NO shuffle of big, pruning every row whose
   bucket holds no small-side key (false positives possible, false
   negatives impossible — exactly a 1-hash bloom);
3. finish with the EXACT semi join on the survivors, so the result
   is identical to the plain semi join while the expensive shuffle
   carries only matches + bucket collisions.

Because step 3 is exact, the whole composition is oracle-checkable
against ``SELECT ... WHERE key IN (...)`` — correctness does not
depend on the digest's selectivity, only the shuffled volume does."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join_with_key_prune(
    big: DataFrame,
    small: DataFrame,
    on: str,
    small_on: str | None = None,
    num_buckets: int = 1 << 20,
) -> DataFrame:
    """Exact LEFT SEMI join of ``big`` against ``small``'s keys, with
    the big side pre-pruned map-side by a broadcast bucket digest.
    Returns exactly ``big.join(small_keys, on, "left_semi")`` rows."""
    key_small = small_on or on
    keys = small.select(F.col(key_small).alias(on)).distinct()
    digest = keys.select(
        F.pmod(F.xxhash64(on), F.lit(num_buckets)).alias("__kb")
    ).distinct()
    pruned = (
        big.withColumn("__kb", F.pmod(F.xxhash64(on), F.lit(num_buckets)))
        .join(F.broadcast(digest), "__kb", "left_semi")
        .drop("__kb")
    )
    return pruned.join(keys, on, "left_semi")


def anti_join_with_key_prune(
    big: DataFrame,
    small: DataFrame,
    on: str,
    small_on: str | None = None,
    num_buckets: int = 1 << 20,
) -> DataFrame:
    """Exact LEFT ANTI complement: rows whose bucket misses the digest
    are anti-matches by construction (no false negatives in step 2),
    so they bypass the exact join entirely; only bucket-hits need the
    real check. Output equals ``big.join(keys, on, "left_anti")``."""
    key_small = small_on or on
    keys = small.select(F.col(key_small).alias(on)).distinct()
    digest = keys.select(
        F.pmod(F.xxhash64(on), F.lit(num_buckets)).alias("__kb")
    ).distinct()
    with_b = big.withColumn("__kb", F.pmod(F.xxhash64(on), F.lit(num_buckets)))
    certain_miss = with_b.join(F.broadcast(digest), "__kb", "left_anti")
    maybe = with_b.join(F.broadcast(digest), "__kb", "left_semi")
    checked = maybe.join(keys, on, "left_anti")
    return certain_miss.drop("__kb").unionByName(checked.drop("__kb"))
